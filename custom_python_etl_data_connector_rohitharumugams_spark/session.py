"""SparkSession factory with the engine's standard configuration.

Every knob here is scale-motivated (see SURVEY.md SS4): AQE for runtime
re-planning/skew handling, Arrow for any Python exchange, UTC pinned for
cross-engine (DuckDB-oracle) timestamp parity, and nanosAsLong so that a
TIMESTAMP(NANOS) ``events`` fixture (one of its historical shapes) reads as a
long instead of erroring (catalog.py normalizes every shape to TimestampType).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Static conf — only applies when THIS process launches the JVM (bench,
#: pytest, CLI). Spark's local-mode default is a 1 GiB driver heap, which on
#: a 32-thread local[32] run means every shuffle, window buffer, broadcast,
#: and Arrow batch contends for the same ~1 GiB — measured here as multi-
#: second GC stalls that turned 2-s queries into 26-s outliers. A real
#: cluster sizes executor memory explicitly; this is the local-mode
#: equivalent. Kept separate from ENGINE_CONF because it cannot be applied
#: to a live session (builder-time only).
STATIC_CONF: dict[str, str] = {
    "spark.driver.memory": "64g",
    "spark.driver.maxResultSize": "4g",
}

ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # local[32] stand-in for a multi-executor cluster: one shuffle partition
    # per core here; on a real 1000-executor cluster this would be set to
    # ~2-3x total cores (or left to AQE coalescing from a high initial value).
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # let Python data sources (restapi) receive pushFilters() — off by
    # default in Spark 4; the REST source turns equality predicates into
    # API query params so filtered extracts fetch fewer pages
    "spark.sql.python.filterPushdown.enabled": "true",
    # events.parquet has shipped as TIMESTAMP(NANOS) in some fixture
    # generations; read nanos as long then convert (catalog normalizes both
    # the nanos-long and timestamp_ntz shapes to TimestampType).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # recursive CTE depth for calendar-spine queries (one row per month —
    # a wide date range must error loudly, not truncate). Also set inside
    # sql_recursive_month_series itself: the driver's correctness session
    # is vanilla (engine conf absent) and the limit must hold when the
    # LAZY frame executes, so the in-query set cannot be restored.
    "spark.sql.cteRecursionLevelLimit": "1000",
}


def get_spark(app_name: str = "etl-connector-spark", cpus: int | str | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else '*'.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in {**STATIC_CONF, **ENGINE_CONF}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # If an existing session was reused, re-assert runtime-settable confs.
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session; builder already applied it
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conf to an externally-built session
    (the driver passes its own SparkSession to ``__spark_entry__.entry``)."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
