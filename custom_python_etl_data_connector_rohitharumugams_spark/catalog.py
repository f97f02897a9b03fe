"""Fixture-table catalog: schema-pinned loading of the driver's test tables.

Tables and schemas per /root/repo/FIXTURES.md. At 100 TB these would be
partitioned/bucketed managed tables; here each is a single parquet file, and
the scale story lives in how the queries are written (pushdown-friendly
filters, broadcastable dims, partial aggregation), not in the loader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at ANY scale factor (region and
#: nation are fixed-size; supplier/part grow with sf but stay dim-sized).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-standard typing.

    ``events.ts`` has shipped in two physical shapes across fixture
    generations: parquet TIMESTAMP(NANOS) (Spark reads it only as a
    nanosecond long under ``legacy.parquet.nanosAsLong``) and
    ``timestamp[us]`` with isAdjustedToUTC=false (Spark 4 reads it as
    TIMESTAMP_NTZ). Both are normalized here — and only here — to
    TimestampType so every downstream plan sees one type. With the session
    pinned to UTC, NTZ->TimestampType reinterpretation and ns->us integer
    truncation both match DuckDB ``epoch()`` exactly (oracle parity).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # integer `div` (not `/`): the ns value exceeds double's 53-bit
            # mantissa, so float division would corrupt low-order digits.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type != "timestamp":
            # timestamp_ntz (or any future variant): session TZ is UTC, so a
            # plain cast is a pure reinterpretation with no wall-clock shift.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each fixture table as a temp view (SQL entry point; mirrors
    the DuckDB-side views the driver pre-registers)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
