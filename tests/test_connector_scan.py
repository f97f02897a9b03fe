"""File-landing scan behavior (S6/P4): corrupt-record routing counts."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

FIXTURE = str(Path(__file__).parent / "fixtures" / "landing.jsonl")


def test_malformed_lines_routed_not_dropped(spark):
    raw = (
        spark.read.schema(
            "id bigint, name string, qty bigint, `when` string, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(FIXTURE)
    ).cache()  # Spark disallows querying ONLY _corrupt_record from a raw scan
    try:
        assert raw.where(F.col("_corrupt_record").isNotNull()).count() == 2
        assert raw.where(F.col("_corrupt_record").isNull()).count() == 40
    finally:
        raw.unpersist()
