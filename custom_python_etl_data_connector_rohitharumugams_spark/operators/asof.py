"""As-of join (SURVEY.md J7): for each left row, attach values from the
nearest right row at-or-before (backward) or at-or-after (forward) its
timestamp within the same key, optionally bounded by a tolerance — pandas
``merge_asof`` semantics, distributed.

Spark has no native as-of join; a naive range join explodes (every left row
matches every earlier right row). This composition is the scale path:

  1. tag and union both sides (no join at all),
  2. one shuffle: window partitioned by key, ordered by (ts, side, tiebreak)
     with right rows sorting before left rows at equal ts,
  3. ``last(value, ignoreNulls=True)`` over an unbounded-preceding frame
     carries the most recent right value forward,
  4. keep only left rows.

Cost: a single hash partition + sort per key — the same shuffle a merge
as-of join does in dedicated time-series engines, with no intermediate
blow-up, no skew beyond the key's own row count, and linear memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Return ``left`` plus, for each ``value_cols`` entry, the value from
    the nearest ``right`` row at-or-before (``direction="backward"``) or
    at-or-after (``direction="forward"``) the left row's timestamp, within
    the same key — pandas ``merge_asof`` semantics, distributed.

    ``tiebreak``: optional right-side column ordering simultaneous right rows
    (the greatest wins, in the column's OWN ordering — strings, timestamps
    and numerics all work); required for determinism when ``right_ts`` can
    tie.
    ``tolerance_sec``: if set, matches farther than this many seconds from
    the left timestamp are nulled out (the row is kept — merge_asof
    behavior). Timestamps compare via ``unix_micros`` (NTZ columns are
    reinterpreted in the session zone first — safe for the DELTA, which
    cancels any fixed offset); numeric ts columns compare in their own
    units.

    NULL timestamps: pandas ``merge_asof`` refuses them; the distributed
    contract here is permissive-but-inert — right rows with a NULL
    ``right_ts`` can never be "nearest" (they are excluded up front, where
    the sort's NULLS FIRST/LAST default would otherwise attach them as
    bogus matches), and left rows with a NULL ``left_ts`` are kept with
    every ``asof_<col>`` NULL.
    Output columns: all of ``left`` + ``asof_<col>`` for each value col.

    Forward direction reuses the same single-shuffle union+window plan with
    the sort reversed: in (ts DESC, side, tie) order the unbounded-preceding
    frame holds exactly the rows with ``right_ts >= left_ts``, and
    ``last(ignoreNulls)`` picks the nearest one. No second shuffle, no plan
    change — direction is purely a sort-key flip.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(value_cols) | {f"asof_{c}" for c in value_cols}) & set(left.columns)
    if overlap:
        raise ValueError(
            f"value_cols (or their asof_<col> output names) collide with "
            f"left columns: {sorted(overlap)}"
        )
    # a NULL-ts right row has no position on the time axis: excluded here,
    # or the window sort's NULLS FIRST/LAST default would hand it out as a
    # "nearest" match (see docstring)
    right = right.where(F.col(right_ts).isNotNull())

    # the nearest right ROW travels as one struct, not per-column: a struct
    # is non-null for every right row even when its fields are NULL, so
    # last(ignorenulls) picks the nearest ROW and a NULL value on that row
    # stays NULL (merge_asof semantics). Carrying columns independently
    # would skip null-valued rows, attach values from OLDER rows, and let
    # the tolerance test use one row's distance for another row's value.
    pack = F.struct(
        *[F.col(c) for c in value_cols], F.col(right_ts).alias("__src_ts")
    )
    pack_type = right.select(pack.alias("p")).schema["p"].dataType
    # the tiebreak orders in its own type (a cast('long') would crash on
    # string tiebreaks under ANSI, or NULL them all out with ANSI off —
    # destroying exactly the determinism the parameter provides)
    if tiebreak:
        tie = F.col(tiebreak)
        tie_type = right.schema[tiebreak].dataType
    else:
        tie, tie_type = F.lit(0).cast("long"), "long"
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(pack_type).alias("__asof_pack"),
        F.lit(None).cast(tie_type).alias("__asof_tie"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        pack.alias("__asof_pack"),
        tie.alias("__asof_tie"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    ts_order = F.col("__asof_ts") if direction == "backward" else F.col("__asof_ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, _SIDE, "__asof_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nearest = F.last("__asof_pack", ignorenulls=True).over(w)
    # NULL-ts left rows have no as-of position: their asof_* outputs are
    # forced NULL instead of whatever the NULLS FIRST/LAST sort placement
    # happened to carry into their frame
    valid = F.col("__asof_ts").isNotNull()
    carried = unioned.select(
        *[c for c in left.columns],
        F.col(_SIDE).alias(_SIDE),
        *[F.when(valid, nearest[c]).alias(f"asof_{c}") for c in value_cols],
        F.when(valid, nearest["__src_ts"]).alias("__asof_src_ts"),
        F.col("__asof_ts").alias("__asof_lts"),
    )
    out = carried.where(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance_sec is not None:
        from pyspark.sql.types import TimestampType, TimestampNTZType

        rt = right.schema[right_ts].dataType
        is_ts = isinstance(rt, (TimestampType, TimestampNTZType))
        is_ntz = isinstance(rt, TimestampNTZType)

        def _num(c):
            if is_ntz:
                # unix_micros only accepts TIMESTAMP; reinterpret NTZ in
                # the session zone first. The DELTA below cancels any
                # fixed session-zone offset (both sides shift equally) —
                # only a DST transition INSIDE the tolerance window on a
                # non-UTC, DST-observing session zone could skew it, and
                # the engine session pins UTC
                c = c.cast("timestamp")
            return F.unix_micros(c) / 1e6 if is_ts else c.cast("double")

        delta = (
            _num(F.col("__asof_lts")) - _num(F.col("__asof_src_ts"))
            if direction == "backward"
            else _num(F.col("__asof_src_ts")) - _num(F.col("__asof_lts"))
        )
        within = F.col("__asof_src_ts").isNotNull() & (delta <= F.lit(float(tolerance_sec)))
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    return out.drop("__asof_src_ts", "__asof_lts")
