"""Event-replay streaming source (SURVEY.md S8): the ``events`` fixture
replayed as a Structured Streaming DataFrame.

Two modes:
- ``events_stream(spark, sf_dir)``: stream the fixture parquet directly
  (single micro-batch under ``availableNow`` — fine for stateless tests);
- ``split_events_for_replay`` then ``events_stream(spark, replay_dir)``:
  time-sliced files + ``maxFilesPerTrigger=1`` => multiple ordered
  micro-batches, which stateful/watermark tests need to exercise
  cross-batch state.
"""

from __future__ import annotations

import glob as _glob
import json as _json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, normalize_event_ts


def _events_glob(source: str) -> str:
    return f"{source}/slice-*.parquet" if source.endswith("_replay") else f"{source}/events.parquet"


def events_stream(
    spark: SparkSession, source: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over the events parquet (file source).

    ``source`` is a fixture dir (``.../sf0.001``) or a ``*_replay`` dir from
    :func:`split_events_for_replay`. The ``ts`` column is normalized through
    the SAME helper the batch catalog uses (catalog.normalize_event_ts), so
    the streaming and batch sides of every plan see one type.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = _events_glob(source)
    # schema pinned from a batch read: streaming file sources require an
    # explicit schema (inference at scale = an extra full footer pass)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_event_ts(reader.parquet(path))


def _time_slices(e: DataFrame, n_slices: int) -> list[DataFrame]:
    """Split ``e`` into ``n_slices`` contiguous time ranges by approximate
    ts percentiles. ``n_slices=1`` short-circuits (percentile_approx
    rejects an empty percentage list)."""
    if n_slices <= 1:
        return [e]
    bounds = e.select(
        F.percentile_approx(
            F.col("ts").cast("double"),
            [i / n_slices for i in range(1, n_slices)],
            10_000,
        ).alias("bs")
    ).collect()[0]["bs"]
    slices = []
    lo = None
    for hi in list(bounds) + [None]:
        sl = e
        if lo is not None:
            sl = sl.where(F.col("ts").cast("double") >= lo)
        if hi is not None:
            sl = sl.where(F.col("ts").cast("double") < hi)
        slices.append(sl)
        lo = hi
    return slices


def _write_slices(slices: list[DataFrame], out_dir: str) -> None:
    """Write each frame as a single ``slice-<i>.parquet`` file with spaced
    mtimes (the file stream source orders by modification time; sub-second
    writes would make replay order ambiguous). STALE slices from a previous
    build with a larger slice count are removed first — the replay glob
    matches ``slice-*.parquet``, so a surviving old tail file would be
    silently replayed a second time."""
    import time as _time

    assert out_dir.endswith("_replay"), "replay dirs are suffixed _replay"
    os.makedirs(out_dir, exist_ok=True)
    for stale in _glob.glob(f"{out_dir}/slice-*.parquet"):
        os.remove(stale)
    for i, sl in enumerate(slices):
        tmp = f"{out_dir}/_tmp-slice-{i}"
        sl.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{out_dir}/slice-{i}.parquet"
        shutil.move(part, dest)
        stamp = _time.time() - 100 * (len(slices) - i)
        os.utime(dest, (stamp, stamp))
        shutil.rmtree(tmp)


#: Planted-late-set predicate shared by :func:`split_events_with_late`, the
#: stream_watermark_late_drop query, and its DuckDB oracle: early events
#: (first ~4 days) whose id ends in 0 are withheld from the on-time slices
#: and replayed LAST — by then the watermark (max ts - 1 day) is ~25 days
#: past their window ends, so a correct watermark implementation MUST drop
#: every one of them. The margin is days, not seconds: no event sits near a
#: boundary, so <= vs < eviction semantics cannot flip the result.
LATE_SET_SQL = "ts < TIMESTAMP '2024-01-05' AND event_id % 10 = 0"


def split_events_with_late(
    spark: SparkSession, sf_dir: str, out_dir: str, n_ontime_slices: int = 2
) -> str:
    """Replay fixture with PLANTED LATE DATA: events matching
    :data:`LATE_SET_SQL` are removed from the time-ordered on-time slices
    and written as the final slice, so under ``maxFilesPerTrigger=1`` they
    arrive in a micro-batch whose starting watermark already passed their
    windows. Deterministic by construction (predicate on fixture columns,
    percentile split bounds, spaced mtimes for stable file order)."""
    assert out_dir.endswith("_replay"), "replay dirs are suffixed _replay"
    os.makedirs(out_dir, exist_ok=True)
    e = load_table(spark, sf_dir, "events")
    # Slices are a pure function of (fixture content, n_ontime_slices,
    # LATE_SET_SQL) and fixture dirs are read-only by contract
    # (TESTDATA.md), so a complete previous build is REUSED: the marker
    # records the source row count + params and is written only after a
    # successful build, so a partial/crashed build never validates. This
    # halves the bench cost of every watermark-replay run after the first.
    import json as _json

    marker = f"{out_dir}/_built.json"
    want = {"n_events": e.count(), "n_ontime_slices": n_ontime_slices,
            "late_sql": LATE_SET_SQL}
    if os.path.exists(marker):
        try:
            if _json.load(open(marker)) == want and len(
                _glob.glob(f"{out_dir}/slice-*.parquet")
            ) == n_ontime_slices + 1:
                return out_dir
        except (ValueError, OSError):
            pass
    if os.path.exists(marker):
        os.remove(marker)
    late = e.where(F.expr(LATE_SET_SQL))
    ontime = e.where(~F.expr(LATE_SET_SQL))
    slices = _time_slices(ontime, n_ontime_slices)
    slices.append(late)  # replayed last: guaranteed behind the watermark
    _write_slices(slices, out_dir)
    with open(marker, "w") as fh:
        _json.dump(want, fh)
    return out_dir


def split_events_for_replay(
    spark: SparkSession, sf_dir: str, out_dir: str, n_slices: int = 3
) -> str:
    """Write events as ``n_slices`` time-ordered single parquet files named
    ``slice-<i>.parquet`` under ``out_dir`` (must end with ``_replay``).

    Skip-if-built (the ``_built.json`` marker, same contract as
    :func:`split_events_with_late`): repeated callers against a fixed
    fixture dir — the per-round bench runs each streaming query 4+
    times — pay the two slice-write jobs once, not per run. The marker
    keys on (row count, slice count), so a changed ``n_slices`` or a
    different-sized corpus rebuilds."""
    e = load_table(spark, sf_dir, "events")
    marker = f"{out_dir}/_built.json"
    want = {"n_events": e.count(), "n_slices": n_slices}
    if os.path.exists(marker):
        try:
            if _json.load(open(marker)) == want and len(
                _glob.glob(f"{out_dir}/slice-*.parquet")
            ) == n_slices:
                return out_dir
        except (ValueError, OSError):
            pass
        os.remove(marker)
    _write_slices(_time_slices(e, n_slices), out_dir)
    with open(marker, "w") as fh:
        _json.dump(want, fh)
    return out_dir


def split_documents_for_replay(
    spark: SparkSession, sf_dir: str, out_dir: str, n_slices: int = 3
) -> str:
    """ARRIVAL-ORDERED document replay fixture: the documents table split
    into ``n_slices`` contiguous doc_id ranges (approximate-percentile
    bounds), one single-file slice per micro-batch under
    ``maxFilesPerTrigger=1``. doc_id IS the arrival order throughout the
    corpus-build family (the incremental build's prefix-property theorem
    quantifies over it), so a doc_id-sliced replay is the streaming form
    of 'batches arrive in id order'. Skip-if-built marker as the event
    splitters."""
    d = load_table(spark, sf_dir, "documents")
    marker = f"{out_dir}/_built.json"
    want = {"n_docs": d.count(), "n_slices": n_slices, "by": "doc_id"}
    if os.path.exists(marker):
        try:
            saved = _json.load(open(marker))
            if {k: saved.get(k) for k in want} == want and len(
                _glob.glob(f"{out_dir}/slice-*.parquet")
            ) == saved.get("actual_slices"):
                return out_dir
        except (ValueError, OSError):
            pass
        os.remove(marker)
    if n_slices <= 1:
        slices = [d]
    else:
        bounds = d.select(
            F.percentile_approx(
                F.col("doc_id").cast("double"),
                [i / n_slices for i in range(1, n_slices)],
                10_000,
            ).alias("bs")
        ).collect()[0]["bs"]
        # EVERY written slice must be non-empty: downstream batch rosters
        # (stream_corpus_admission counts batches from per-batch state
        # rows) assume each micro-batch lands at least one row. Skewed or
        # duplicate-heavy doc_id distributions can make percentile bounds
        # coincide (or equal the minimum), which would produce silently
        # empty slices — deduplicate the bounds to a strictly increasing
        # list, then drop any range a degenerate distribution still left
        # empty (n_slices <= 4, counted once per build, marker-amortized).
        uniq: list[float] = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        slices = []
        lo = None
        for hi in uniq + [None]:
            sl = d
            if lo is not None:
                sl = sl.where(F.col("doc_id").cast("double") >= lo)
            if hi is not None:
                sl = sl.where(F.col("doc_id").cast("double") < hi)
            slices.append(sl)
            lo = hi
        slices = [sl for sl in slices if sl.limit(1).count() > 0]
    _write_slices(slices, out_dir)
    want["actual_slices"] = len(slices)
    with open(marker, "w") as fh:
        _json.dump(want, fh)
    return out_dir


def documents_stream(
    spark: SparkSession, replay_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over a :func:`split_documents_for_replay` dir (schema
    pinned from a batch read, as :func:`events_stream`)."""
    path = f"{replay_dir}/slice-*.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
