"""Python streaming SINK (PySpark 4 ``DataSourceStreamWriter``) — the
write-side twin of the REST connector's Python streaming source: the same
Data Source API surface, pointed at landing instead of polling.

The protocol this implements is the real two-phase one every production
sink speaks, and it is what makes the landing EXACTLY-ONCE:

- executors ``write()`` their partition of each micro-batch to
  uniquely-named parquet files (pyarrow, Arrow-native) and return a
  :class:`LandCommit` message per task;
- the DRIVER ``commit()``s the batch by writing one atomic manifest
  listing exactly the committed files — a retried/zombie task attempt may
  leave an orphan data file on disk, but no manifest ever names it;
- readers (:func:`read_landed`) resolve the manifest set FIRST and read
  only manifested files, so replays, task retries, and aborted batches
  are invisible downstream (``abort()`` best-effort deletes the attempt
  files, but correctness never depends on that cleanup happening).

At 100 TB this is the same contract object-store sinks use (files +
atomic manifest-pointer swap); the manifest directory doubles as the
commit log a compaction job or a table format would consume. Per-batch
manifests are idempotent under Structured Streaming's batchId-keyed
re-delivery: re-committing batch N overwrites batch-N's manifest with an
equivalent file set, never double-counts it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class LandCommit(WriterCommitMessage):
    """Per-task commit message: which file this attempt wrote, how many
    rows it holds (None/0 for an empty partition — no file written)."""

    file: str | None
    rows: int


class LandingStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("landing sink: 'path' option is required")
        self.path = options["path"]

    def write(self, iterator):  # executor-side, once per task per batch
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return LandCommit(file=None, rows=0)
        cols = rows[0].__fields__
        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        # attempt-unique name: a retried task writes a SECOND file; only
        # the attempt whose message reaches commit() gets manifested
        fname = os.path.join(data_dir, f"part-{uuid.uuid4().hex}.parquet")
        table = pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})
        pq.write_table(table, fname)
        return LandCommit(file=fname, rows=len(rows))

    def commit(self, messages, batchId: int) -> None:  # driver-side
        man_dir = os.path.join(self.path, "manifests")
        os.makedirs(man_dir, exist_ok=True)
        files = [m.file for m in messages if m is not None and m.file]
        rows = sum(m.rows for m in messages if m is not None)
        manifest = {"batch": int(batchId), "files": sorted(files), "rows": rows}
        final = os.path.join(man_dir, f"batch-{int(batchId):010d}.json")
        tmp = f"{final}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # atomic manifest publish

    def abort(self, messages, batchId: int) -> None:  # driver-side
        # best-effort cleanup; unmanifested files are inert either way
        for m in messages:
            if m is not None and m.file:
                try:
                    os.remove(m.file)
                except OSError:
                    pass


class LandingDataSource(DataSource):
    """``spark.dataSource.register(LandingDataSource)`` then
    ``df.writeStream.format("landing").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "landing"

    def streamWriter(self, schema, overwrite: bool) -> LandingStreamWriter:
        return LandingStreamWriter(self.options)


def landed_manifests(path: str) -> list[dict]:
    """The committed batch manifests, batch-ordered (driver-side listing —
    the same metadata-only LIST the docsink fragmentation report does)."""
    man_dir = os.path.join(path, "manifests")
    out = []
    for entry in sorted(os.listdir(man_dir)) if os.path.isdir(man_dir) else []:
        if entry.startswith("batch-") and entry.endswith(".json"):
            with open(os.path.join(man_dir, entry)) as f:
                out.append(json.load(f))
    return out


def read_landed(spark: SparkSession, path: str) -> DataFrame:
    """Read ONLY manifested files — orphan attempt files on disk are
    never visible (the exactly-once read side of the contract). Returns
    an empty-but-typed frame when nothing has committed yet."""
    files = [f for m in landed_manifests(path) for f in m["files"]]
    if not files:
        raise ValueError(f"landing sink at {path}: no committed batches")
    return spark.read.parquet(*files)
