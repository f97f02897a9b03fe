"""Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
DataFrame-native mergeable frequency summary.

The sketch is a depth×width grid of counters; key k increments cell
(i, h_i(k)) for each of the depth seeds, and the point estimate is the MIN
over the depth cells — never an underestimate, over by at most ε·N
(ε = e/width) with probability 1-e^{-depth} per probe. What makes it the
100 TB tool: the grid is LINEAR — cms(A ⊎ B) = cms(A) + cms(B) cell-wise,
exactly — so per-partition / per-day partials merge by addition without
rescanning, the same storage shape as the per-month HLL partials in
plans/advanced.agg_hll_partition_merge (frequency sketch next to the
distinct-count sketch).

Representation: a sparse DataFrame of (seed, bucket, cnt) rows — at most
depth·width rows regardless of input size. The build is ONE groupBy, so
Spark's partial aggregation already performs the distributed merge
executor-side (each task adds its partition's contribution before the
16k-cell shuffle); explicit sketch-plus-sketch merge is the same
groupBy over a union of cell sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 4096


def _bucket(key: Column, seed: int, width: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(width))


def _cells(key: Column, depth: int, width: int) -> Column:
    """The exploded (seed, bucket) cell address array for ``key`` — ONE
    definition shared by build and probe, so the two sides can never
    drift on cell addressing (a divergent copy would silently corrupt
    every estimate while still passing the zero-floor check)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seed"),
                    _bucket(key, i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )


def cms_eps_bound(n_total: int, width: int = DEFAULT_WIDTH) -> int:
    """The paper's point-estimate bound: est - exact <= ceil(e·N/width)
    per probe (w.p. 1 - e^-depth per seed set; deterministic here for
    fixed data + seeds). ONE definition — the registered queries and the
    headroom test must gate against the same number."""
    import math

    return int(math.e * n_total / width) + 1


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """(seed, bucket, cnt) sparse cell grid over ``df[key_col]``. One
    explode to depth rows per input row, one groupBy — the map-side
    combine IS the partition merge."""
    cells = df.select(_cells(F.col(key_col), depth, width).alias("c"))
    return (
        cells.groupBy(F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise addition — exact, by linearity. Sketches must share
    (depth, width, seeds); cells absent from a sketch are zero."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """``probes`` plus an ``est`` column: min over the depth cells of the
    probe key. The sketch side is ≤ depth·width rows, so it broadcasts;
    a probe key that was never inserted can hit an empty (absent) cell —
    coalesce to 0 keeps the no-underestimate theorem for inserted keys
    and the correct 0-floor for absent ones.

    Probe-frame contract (the min is re-grouped on ALL probe columns):
    - probe rows must be DISTINCT — duplicate rows collapse to one
      output row (the groupBy cannot tell them apart);
    - ``seed``/``bucket``/``cnt``/``est`` are reserved names — a probe
      frame already carrying one would collide with the join columns.
    Current callers (heavy-hitter top-k, streaming maintenance) pass
    distinct key frames; widen by pre-renaming probe columns if a raw
    event frame must ever be probed directly."""
    probed = probes.select(
        "*", _cells(F.col(key_col), depth, width).alias("c")
    ).select("*", F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
    joined = probed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    group_cols = [c for c in probes.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
