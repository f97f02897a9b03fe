"""Streaming operators over the event stream (SURVEY.md T1-T7).

Each function takes a (streaming or batch) events DataFrame and returns the
transformed DataFrame — the logical plan is identical in both modes, which is
exactly the correctness argument: the batch result is the oracle for the
incremental execution (tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _value_total():
    """Order-free window total: per-event values quantize to integer cents
    BEFORE aggregation (exact integer sum — micro-batch accumulation order
    and shuffle partial-agg order both stop mattering), then one
    deterministic division presents the 2-decimal total. A post-hoc
    ROUND(SUM(double)) is the half-cent drift documented in
    plans/stream_batch._watermarked_tumbling_agg."""
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return F.round(F.sum(cents) / 100.0, 2)


def tumbling_counts(events: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """T1/T4: watermarked tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), _value_total().alias("total_value"))
        .select(
            F.col("win.start").cast("long").alias("win_start_sec"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def sliding_volume(events: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """T2: sliding windows (10 min / 5 min slide)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("cnt"), _value_total().alias("total_value"))
        .select(F.col("win.start").cast("long").alias("win_start_sec"), "cnt", "total_value")
    )


def session_stats(events: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """T3: gap-based session windows per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "5 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _value_total().alias("session_value"))
        .select(
            "user_id",
            F.col("win.start").cast("long").alias("session_start_sec"),
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T5: streaming dedup on (user_id, event_type) within the watermark
    horizon."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_purchases", LongType()),
        StructField("total_spend", DoubleType()),
    ]
)

#: state carries integer CENTS, not a double: the running sum is then an
#: exact integer at every batch boundary, so emissions are byte-identical
#: to the batch twin's cumulative-cents window (stream_running_totals_
#: update_log) regardless of micro-batch slicing — and Python round()'s
#: half-even can never disagree with Spark's HALF_UP on a half-cent.
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total_cents", LongType())]
)


def _batch_cents(values: "pd.Series") -> int:
    import numpy as np

    return int(np.floor(values.to_numpy(dtype="float64") * 100 + 0.5).sum())


def running_purchase_totals(events: DataFrame) -> DataFrame:
    """T6: arbitrary stateful op — per-user running purchase count/spend via
    applyInPandasWithState (state persists across micro-batches; each batch
    emits the updated running totals for users seen in that batch)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    purchases = events.where(F.col("event_type") == "purchase").select("user_id", "value")

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += _batch_cents(pdf["value"])
        state.update((n, int(cents)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_purchases": [n], "total_spend": [cents / 100.0]}
        )

    return purchases.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_purchase_totals_tws(events: DataFrame) -> DataFrame:
    """T6 on the Spark 4 ``transformWithStateInPandas`` API: same running
    per-user purchase totals, expressed as a StatefulProcessor with typed
    ValueState (the RocksDB-backed successor to applyInPandasWithState).

    NOTE: this API's state server needs a working ``google.protobuf``
    runtime; environments without it should use
    :func:`running_purchase_totals` (identical semantics) — the test suite
    skips accordingly.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    purchases = events.where(F.col("event_type") == "purchase").select("user_id", "value")

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total_cents long")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += _batch_cents(pdf["value"])
            self._state.update((n, int(cents)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_purchases": [n], "total_spend": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    return purchases.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def click_purchase_join(
    purchases: DataFrame,
    clicks: DataFrame,
    watermark: str = "1 hour",
    lookback: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """T8 stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``lookback`` window.

    Both sides are watermarked and the join condition carries an explicit
    event-time range, which is what lets Structured Streaming bound the
    join state: a buffered click can be dropped once the purchase-side
    watermark passes click.ts + lookback. Without the range the state
    grows forever — THE sizing rule for stream-stream joins at 100 TB.
    On batch frames withWatermark is a no-op and the identical plan is the
    oracle (tests/test_streaming.py).

    ``how="leftOuter"`` keeps click-less purchases: in streaming, the
    engine emits the null-padded row only once the watermark proves no
    future click can still land in the purchase's lookback window —
    i.e. outer results trail the watermark by design, and a purchase
    whose deadline the final watermark never passes is withheld, not
    wrong. tests/test_streaming.py flushes that tail with a sentinel
    event that advances the watermark past every real purchase, the
    standard close-the-books move for finite replays (a production
    stream just keeps running).
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("c_ts") < F.col("p_ts")),
        how,
    ).select(
        "purchase_id", "user_id", "p_ts", "purchase_value", "click_id", "c_ts", "click_value"
    )
