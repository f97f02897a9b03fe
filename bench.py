"""Per-round benchmark: run every registered named query at the bench scale
factor and print ONE JSON line (driver contract, TESTDATA.md:17-19).

Protocol (BASELINE.md): one warm-up execution, then one measured run per
query; execution is forced with the noop sink (full materialization, no
driver collect). Env knobs: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from custom_python_etl_data_connector_rohitharumugams_spark import plans
    from custom_python_etl_data_connector_rohitharumugams_spark.session import get_spark

    spark = get_spark("engine-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    qdefs = plans.all_queries()
    # warm-up: JVM/codegen/file-listing warm path
    run(qdefs["pricing_summary"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(qdefs):
        t0 = time.perf_counter()
        run(qdefs[name].fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total wall-clock over all named queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
