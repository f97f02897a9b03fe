"""Structured Streaming tests (SURVEY.md SS2.8): each streaming operator's
availableNow replay must reproduce the batch execution of the same plan.

Replay fixture: events split into 3 time-ordered slices, maxFilesPerTrigger=1
=> 3 micro-batches, so watermark advancement and cross-batch state are
genuinely exercised (not a single-batch degenerate run).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_rohitharumugams_spark.catalog import load_table
from custom_python_etl_data_connector_rohitharumugams_spark.streaming import ops
from custom_python_etl_data_connector_rohitharumugams_spark.streaming.replay import (
    events_stream,
    split_events_for_replay,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream") / "events_replay")
    return split_events_for_replay(spark, SF, out, n_slices=3)


def run_to_memory(spark, sdf, name, output_mode, checkpoint_dir):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def _sorted(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(map(tuple, pdf[cols].values.tolist()))


def test_tumbling_stream_equals_batch(spark, replay_dir, tmp_path):
    sdf = events_stream(spark, replay_dir, max_files_per_trigger=1)
    got = run_to_memory(spark, ops.tumbling_counts(sdf), "t1_out", "complete", str(tmp_path / "cp"))
    batch = ops.tumbling_counts(load_table(spark, SF, "events")).toPandas()
    assert _sorted(got) == _sorted(batch)


def test_sliding_stream_equals_batch(spark, replay_dir, tmp_path):
    sdf = events_stream(spark, replay_dir, max_files_per_trigger=1)
    got = run_to_memory(spark, ops.sliding_volume(sdf), "t2_out", "complete", str(tmp_path / "cp"))
    batch = ops.sliding_volume(load_table(spark, SF, "events")).toPandas()
    assert _sorted(got) == _sorted(batch)


def test_session_stream_equals_batch(spark, replay_dir, tmp_path):
    sdf = events_stream(spark, replay_dir, max_files_per_trigger=1)
    got = run_to_memory(spark, ops.session_stats(sdf), "t3_out", "complete", str(tmp_path / "cp"))
    batch = ops.session_stats(load_table(spark, SF, "events")).toPandas()
    assert _sorted(got) == _sorted(batch)


def test_streaming_dedup_within_watermark(spark, replay_dir, tmp_path):
    sdf = events_stream(spark, replay_dir, max_files_per_trigger=1)
    got = run_to_memory(
        spark, ops.dedup_within_watermark(sdf), "t5_out", "append", str(tmp_path / "cp")
    )
    exact = (
        load_table(spark, SF, "events").select("user_id", "event_type").distinct().toPandas()
    )
    # every distinct key appears at least once; watermark-expired state may
    # let a late re-occurrence through, but never below the distinct set
    got_set = set(map(tuple, got.values.tolist()))
    exact_set = set(map(tuple, exact.values.tolist()))
    assert exact_set <= got_set
    assert len(got) <= load_table(spark, SF, "events").count()


def test_stateful_running_totals(spark, replay_dir, tmp_path):
    sdf = events_stream(spark, replay_dir, max_files_per_trigger=1)
    got = run_to_memory(
        spark, ops.running_purchase_totals(sdf), "t6_out", "update", str(tmp_path / "cp")
    )
    # update mode emits one row per user per batch in which they appeared;
    # the final running total per user = the max n_purchases row
    final = got.loc[got.groupby("user_id")["n_purchases"].idxmax()]
    batch = (
        load_table(spark, SF, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_spend"),
        )
        .toPandas()
    )
    f = final.set_index("user_id").sort_index()
    b = batch.set_index("user_id").sort_index()
    assert list(f.index) == list(b.index)
    assert (f["n_purchases"] == b["n_purchases"]).all()
    assert (abs(f["total_spend"] - b["total_spend"]) < 0.02).all()
    # state really crossed batches: some user must appear in >1 micro-batch
    assert (got.groupby("user_id").size() > 1).any()


def test_stream_static_join(spark, replay_dir, tmp_path):
    sdf = events_stream(spark, replay_dir, max_files_per_trigger=1)
    cust = load_table(spark, SF, "customer")
    joined = (
        sdf.join(F.broadcast(cust), sdf.user_id % 150 == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = run_to_memory(spark, joined, "t7_out", "complete", str(tmp_path / "cp"))
    batch = (
        load_table(spark, SF, "events")
        .alias("e")
        .join(F.broadcast(cust), F.col("user_id") % 150 == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .toPandas()
    )
    assert _sorted(got) == _sorted(batch)
