"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual operator surface lives in
``custom_python_etl_data_connector_rohitharumugams_spark.plans`` — this file
is a thin adapter over the registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from custom_python_etl_data_connector_rohitharumugams_spark import plans, session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    session.configure(spark)
    qd = plans.all_queries()["pricing_summary"]
    return qd.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md SS2."""

    def wrap(qd):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            session.configure(spark)
            return qd.fn(spark, sf_dir)

        run.__name__ = qd.name
        return run

    return {name: wrap(qd) for name, qd in plans.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return plans.oracle_map()
