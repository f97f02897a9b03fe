"""Connector-layer queries (SURVEY.md S6/P4): raw-file landing scans with
PERMISSIVE malformed-row routing, oracled against DuckDB's file readers over
the same repo-local fixture files (the REST source itself is covered by the
fake-API unit suite — no network in the driver's oracle run)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

_FIXTURES = Path(__file__).resolve().parents[2] / "tests" / "fixtures"
_JSONL = str(_FIXTURES / "landing.jsonl")
_CSV = str(_FIXTURES / "landing.csv")


@query(
    "connector_json_landing",
    tags=("S6", "P4", "P5"),
    oracle=f"""
    SELECT id, name, qty,
           CAST(floor(epoch(CAST("when" AS TIMESTAMP))) AS BIGINT) AS when_sec
    FROM read_json('{_JSONL}', format='newline_delimited',
                   columns={{id: 'BIGINT', name: 'VARCHAR', qty: 'BIGINT',
                            "when": 'VARCHAR'}},
                   ignore_errors=true)
    WHERE id IS NOT NULL
    """,
)
def connector_json_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL landing scan: PERMISSIVE mode routes the two malformed lines to
    _corrupt_record (asserted in tests/test_connector_scan.py); valid rows
    are type-coerced — the reference's raw-API-dump ingestion path."""
    raw = (
        spark.read.schema(
            "id bigint, name string, qty bigint, `when` string, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(_JSONL)
    )
    return (
        raw.where(F.col("_corrupt_record").isNull() & F.col("id").isNotNull())
        .select(
            "id",
            "name",
            "qty",
            F.unix_timestamp(F.to_timestamp("when")).alias("when_sec"),
        )
    )


@query(
    "connector_csv_landing",
    tags=("S6", "P5"),
    oracle=f"""
    SELECT name, CAST(SUM(qty) AS BIGINT) AS total_qty,
           ROUND(SUM(price), 2) AS total_price, COUNT(*) AS cnt
    FROM read_csv('{_CSV}', header=true,
                  columns={{id: 'BIGINT', name: 'VARCHAR', qty: 'BIGINT',
                           price: 'DOUBLE'}})
    GROUP BY name
    """,
)
def connector_csv_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV landing scan with explicit schema + aggregate."""
    df = (
        spark.read.schema("id bigint, name string, qty bigint, price double")
        .option("header", "true")
        .csv(_CSV)
    )
    return df.groupBy("name").agg(
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.round(F.sum("price"), 2).alias("total_price"),
        F.count(F.lit(1)).alias("cnt"),
    )
