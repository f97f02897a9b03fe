"""Bucketed-table layout helpers (SURVEY.md SS4 scale patterns).

The one shuffle AQE cannot remove from a fact-fact join (orders JOIN
lineitem at 100 TB) disappears when both tables are written bucketed and
sorted on the join key: every bucket pair is co-located, so the join plans
as a zero-Exchange SortMergeJoin reading matching buckets directly. The
write cost is paid once; every subsequent join on that key is shuffle-free.
Asserted against the physical plan in tests/test_scale_patterns.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) managed table.

    ``n_buckets`` must MATCH across tables that will be joined — co-location
    only holds for equal bucket counts on the join key. At 100 TB pick
    n_buckets so each bucket is a few hundred MB (e.g. 4096+ for lineitem).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys.

    With matching bucket counts the physical plan contains NO Exchange on
    either join side (bucket pruning + per-bucket sorted merge); the test
    suite asserts this property rather than trusting it.

    When both tables use the SAME key name (the common co-bucketing case,
    e.g. events and profiles both on user_id) the join uses the name-list
    form so the output carries ONE coalesced key column — an expression
    join would emit two identically-named columns and every downstream
    name reference would be ambiguous.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    if left_key == right_key:
        return left.join(right, [left_key])
    return left.join(right, left[left_key] == right[right_key])
