"""As-of join (SURVEY.md J7): for each left row, attach values from the
latest right row with ``right_ts <= left_ts`` within the same key.

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
) -> DataFrame:
    """Return ``left`` plus, for each ``value_cols`` entry, the value from the
    latest ``right`` row at-or-before the left row's timestamp (same key).

    ``tiebreak``: optional right-side column ordering simultaneous right rows
    (the greatest wins); required for determinism when ``right_ts`` can tie.
    Output columns: all of ``left`` + ``asof_<col>`` for each value col.
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(None).cast("long").alias("__asof_tie"),
    )
    tie = F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in value_cols],
        tie.alias("__asof_tie"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", _SIDE, "__asof_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        F.col(_SIDE).alias(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    return carried.where(F.col(_SIDE) == 1).drop(_SIDE)
