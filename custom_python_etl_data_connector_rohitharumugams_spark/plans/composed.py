"""Composed-operator queries (SURVEY.md SS2.3 J7): operators Spark lacks
natively, built as documented compositions of built-in operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join
from .registry import query


@query(
    "asof_purchase_last_click",
    tags=("J7",),
    oracle="""
    SELECT event_id AS purchase_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS purchase_sec,
           asof_click_id
    FROM (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts,
                                CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                                event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS asof_click_id
        FROM events
        WHERE event_type IN ('click', 'purchase')
    )
    WHERE event_type = 'purchase'
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the latest click event of the
    same user at-or-before its timestamp (union+window composition — one
    shuffle, no range-join explosion; see operators/asof.py)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("long").alias("purchase_sec"),
        F.col("ts").alias("__pts"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("asof_click_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="__pts",
        right_ts="ts",
        value_cols=["asof_click_id"],
        tiebreak="asof_click_id",
    )
    return joined.select(
        "purchase_id", "user_id", "purchase_sec", F.col("asof_asof_click_id").alias("asof_click_id")
    )


@query(
    "asof_next_purchase_within_2d",
    tags=("J7", "F2"),
    oracle="""
    SELECT event_id AS click_id, user_id,
           CASE WHEN matched_ts IS NOT NULL
                     AND epoch(matched_ts) - epoch(ts) <= 172800.0
                THEN np_id END AS next_purchase_id
    FROM (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
                          IGNORE NULLS)
                 OVER w AS np_id,
               LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END
                          IGNORE NULLS)
                 OVER w AS matched_ts
        FROM events
        WHERE event_type IN ('click', 'purchase')
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts DESC,
                              CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END,
                              event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    WHERE event_type = 'click'
    """,
)
def asof_next_purchase_within_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each click picks up the NEXT
    purchase of the same user at-or-after its timestamp, nulled when the
    purchase is more than 2 days out (merge_asof forward+tolerance
    semantics). Same single-shuffle union+window plan as the backward form
    — direction is a sort-key flip, tolerance a post-projection
    (operators/asof.py)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("__cts")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("next_purchase_id")
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="__cts",
        right_ts="ts",
        value_cols=["next_purchase_id"],
        tiebreak="next_purchase_id",
        direction="forward",
        tolerance_sec=172800,
    )
    return joined.select(
        "click_id", "user_id", F.col("asof_next_purchase_id").alias("next_purchase_id")
    )
