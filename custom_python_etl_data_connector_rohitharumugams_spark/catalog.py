"""Fixture-table catalog: schema-pinned loading of the driver's test tables.

Tables and schemas per /root/repo/FIXTURES.md. At 100 TB these would be
partitioned/bucketed managed tables; here each is a single parquet file, and
the scale story lives in how the queries are written (pushdown-friendly
filters, broadcastable dims, partial aggregation), not in the loader.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

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


#: per-session DataFrame cache. ``spark.read.parquet`` costs a driver-side
#: file listing + footer read (~60 ms measured) on EVERY call; a query suite
#: re-resolving the same ten read-only tables hundreds of times pays tens of
#: seconds for nothing. A real deployment fronts the lake with a metastore
#: that caches exactly this metadata — this dict is the local-mode
#: equivalent. Keyed weakly by session so a stopped session's entries die
#: with it; DataFrames are immutable plans, so sharing one across queries is
#: safe. The fixture dirs are read-only by contract (TESTDATA.md), so
#: staleness cannot arise.
_RESOLVED: "WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    WeakKeyDictionary()
)


def ts_lit(s: str):
    """Timestamp literal with engine-standard typing — ONE definition of
    the oracle-parity-critical `lit(...).cast("timestamp")` idiom (under
    the pinned UTC session it matches DuckDB TIMESTAMP literals exactly)."""
    return F.lit(s).cast("timestamp")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """``events.ts`` physical-shape normalization — THE single definition
    (both fixture shapes documented in :func:`load_table`); the streaming
    replay source reuses it so batch and stream can never drift on a new
    fixture shape."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer `div` (not `/`): the ns value exceeds double's 53-bit
        # mantissa, so float division would corrupt low-order digits.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type not in (None, "timestamp"):
        # timestamp_ntz (or any future variant): session TZ is UTC, so a
        # plain cast is a pure reinterpretation with no wall-clock shift.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-standard typing (cached per
    session — see ``_RESOLVED``).

    ``events.ts`` has shipped in two physical shapes across fixture
    generations: parquet TIMESTAMP(NANOS) (Spark reads it only as a
    nanosecond long under ``legacy.parquet.nanosAsLong``) and
    ``timestamp[us]`` with isAdjustedToUTC=false (Spark 4 reads it as
    TIMESTAMP_NTZ). Both are normalized here — and only here — to
    TimestampType so every downstream plan sees one type. With the session
    pinned to UTC, NTZ->TimestampType reinterpretation and ns->us integer
    truncation both match DuckDB ``epoch()`` exactly (oracle parity).
    """
    try:
        cache = _RESOLVED.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable: skip caching
        cache = None
    key = (sf_dir.rstrip("/"), name)
    if cache is not None and key in cache:
        return cache[key]

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_event_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if cache is not None:
        cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each fixture table as a temp view (SQL entry point; mirrors
    the DuckDB-side views the driver pre-registers)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
