"""Driver-simulation verify: run __spark_entry__ the way the external
driver does and hash-compare every query against its DuckDB oracle.

Vanilla SparkSession (no engine conf — engine code must self-configure),
entry() smoke at sf0.001, then each queries()[name] at sf0.01 against
oracle_sql()[name] with the driver's compare semantics (sorted columns,
order-insensitive rows, floats canonicalized at 9 decimals).

Usage:
  python tools/verify_driver.py                 # the driver's 50-query window
  python tools/verify_driver.py --all           # every registered query
  python tools/verify_driver.py name1 name2 ... # just these queries
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
SF_ORACLE = "/root/testdata/sf0.01"


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    run_all = "--all" in sys.argv[1:]

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    print("entry rows:", len(E.entry(spark).collect()))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    # ONE compare implementation: the pytest mirror's type-tagged canon
    # (tests/parity.py) — a local reimplementation here would miss the
    # int-vs-float drift (123 == 123.0 in Python, a MISMATCH in the
    # driver's value hash) that tests/parity._canon exists to catch
    from tests.parity import assert_frames_match

    qs, osql = E.queries(), E.oracle_sql()
    names = args or (list(qs) if run_all else list(qs)[:50])
    fails, rows_only = [], []
    for name in names:
        sp = qs[name](spark, SF_ORACLE).toPandas()
        if name not in osql:
            rows_only.append(name)
            print(f"  {name}: rows-only ({len(sp)} rows)")
            continue
        du = con.execute(osql[name]).fetchdf()
        try:
            assert_frames_match(sp, du, name)
        except AssertionError as e:
            fails.append(name)
            print(f"  {name}: MISMATCH — {e}")
    print(f"checked {len(names)} ({len(rows_only)} rows-only)")
    print("RESULT:", fails or "ALL MATCH")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
