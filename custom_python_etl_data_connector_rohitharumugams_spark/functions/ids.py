"""Engine-portable deterministic bucketing (F8 surface).

ONE definition of the md5-bucket rule: the stratified split
(plans/llm_pipeline), the domain-mixture sampler, and the training-shard
sink all assign rows by this function — a drifted copy in any one of them
would silently desynchronize shard membership from the split that feeds it.
md5 (not Spark's internal Murmur3) so any engine — the DuckDB oracle
included — reproduces the assignment bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def md5_bucket(col, mod: int):
    """Deterministic integer bucket in [0, mod): first 8 md5 hex digits of
    the stringified column, mod ``mod``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % mod
    )
