"""Training-shard sink: deterministic sharded parquet layout for a corpus
build's final write (the step after packing/splitting in SURVEY.md §2.10).

A 100 TB training run wants shards that are (a) deterministic — re-running
the build reproduces byte-identical shard membership regardless of input
partitioning or cluster size; (b) balanced — shard assignment is a hash of
the stable document id, not of physical row order; (c) self-describing — a
manifest records per-shard row counts and a content checksum so a consumer
can verify a shard without re-reading the corpus.

Layout::

    out_dir/
      split=train/shard=0/part-*.parquet
      split=train/shard=1/...
      split=val/shard=0/...
      _shard_manifest.json

Shard assignment is the same engine-portable md5-bucket used for the
stratified split (plans/llm_pipeline._md5_bucket): first 8 md5 hex digits of
the id, mod n_shards — reproducible in any engine, unlike a hash tied to
Spark's internal Murmur3 seed. One ``repartition(split, shard)`` gives one
task (and so one file) per output shard; ``sortWithinPartitions(id)`` makes
the row order inside a shard deterministic too.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"
MANIFEST_NAME = "_shard_manifest.json"


def shard_assignment(id_col, n_shards: int):
    """Engine-portable shard id in [0, n_shards) from a stable id column
    (the ONE md5-bucket rule shared with the stratified split —
    functions/ids.py)."""
    from ..functions.ids import md5_bucket

    return md5_bucket(id_col, n_shards)


def _shard_stats(df: DataFrame, split_col: str, shard_col: str, id_col: str):
    """Per-(split, shard) row count + order-insensitive content checksum.
    xxhash64 values are summed as decimal(38,0) — an int64 sum overflows
    under ANSI mode after a handful of rows — then reduced mod 2^64."""
    return (
        df.groupBy(split_col, shard_col)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.xxhash64(F.col(id_col)).cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()  # one row per (split, shard) — bounded by the layout
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> dict:
    """Write ``df`` as the sharded training layout; returns the manifest.

    The manifest maps ``"<split>/<shard>"`` to ``{"rows": n, "checksum":
    hex}`` where the checksum is an order-insensitive aggregate (sum of
    per-row xxhash64 of the id, as unsigned hex). It is computed from the
    WRITTEN files, not from ``df``'s lineage: re-executing the input plan
    would double the cost of the whole corpus build AND — for any
    nondeterministic upstream (live extract, sampling) — describe rows the
    files don't contain, so verify would fail healthy shards. A ``_meta``
    entry records the layout parameters so the consumer-side verify needs
    no out-of-band knowledge.

    The manifest itself is written with local-filesystem IO: fail FAST on
    an object-store/remote ``out_dir`` (``s3://`` etc.) rather than
    complete the expensive corpus write and then crash on the tiny JSON.
    The remote-store port writes the manifest through the same Hadoop
    FileSystem handle as the parquet (one ``FileSystem.create`` call) —
    not done here because no remote FS exists in this environment to test
    it against."""
    if "://" in out_dir and not out_dir.startswith("file://"):
        raise ValueError(
            f"write_training_shards writes its manifest via local-file IO; "
            f"remote out_dir {out_dir!r} would complete the parquet write "
            "and then fail on the manifest — use a local path, or port the "
            "manifest IO to the Hadoop FileSystem API first"
        )
    sharded = df.withColumn(SHARD_COL, shard_assignment(F.col(id_col), n_shards))
    (
        sharded.repartition(split_col, SHARD_COL)
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy(split_col, SHARD_COL)
        .parquet(out_dir)
    )
    stats = _shard_stats(
        read_training_shards(df.sparkSession, out_dir), split_col, SHARD_COL, id_col
    )
    manifest = {
        f"{r[split_col]}/{r[SHARD_COL]}": {
            "rows": r["rows"],
            "checksum": format(int(r["checksum"]) % (1 << 64), "016x"),
        }
        for r in stats
    }
    meta = {"id_col": id_col, "split_col": split_col, "n_shards": n_shards}
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump({**manifest, "_meta": meta}, f, indent=1, sort_keys=True)
    return manifest  # stats only; _meta lives in the file for verify


def read_training_shards(spark, out_dir: str) -> DataFrame:
    """Read a sharded layout back (partition columns restored as columns)."""
    return spark.read.parquet(out_dir)


def verify_training_shards(spark, out_dir: str, id_col: str | None = None) -> dict:
    """Recompute the manifest from the written files and diff against the
    stored one. Returns {"ok": bool, "mismatched": [...]} — the consumer-side
    integrity check before a training job trusts a shard. Layout parameters
    (id/split column names) come from the manifest's ``_meta`` entry, so a
    non-default layout verifies without out-of-band knowledge; ``id_col``
    overrides it if given."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        stored = json.load(f)
    meta = stored.pop("_meta", {})
    id_col = id_col or meta.get("id_col", "doc_id")
    split_col = meta.get("split_col", "split")
    df = read_training_shards(spark, out_dir)
    stats = _shard_stats(df, split_col, SHARD_COL, id_col)
    actual = {
        f"{r[split_col]}/{r[SHARD_COL]}": {
            "rows": r["rows"],
            "checksum": format(int(r["checksum"]) % (1 << 64), "016x"),
        }
        for r in stats
    }
    mismatched = sorted(
        k
        for k in set(stored) | set(actual)
        if stored.get(k) != actual.get(k)
    )
    return {"ok": not mismatched, "mismatched": mismatched}
