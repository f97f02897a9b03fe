"""Skew-mitigation helpers (SURVEY.md SS4 "skew handling"; DESIGN.md).

AQE's skew-join splitting covers most cases at runtime; explicit salting is
the escape hatch for pathological keys (one key >> everything else) or for
skewed AGGREGATION state. Both helpers are pure plan rewrites whose results
are provably identical to the unsalted form — the oracle checks that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is large with skewed key distribution and
    ``right`` is small-ish but not broadcastable: each left row gets a
    deterministic salt in [0, salt); ``right`` is replicated ``salt`` times.
    The hot key's rows then spread over ``salt`` reducers instead of one.

    Deterministic salting (hash of the whole row, not rand()) keeps retried
    tasks and re-runs bit-identical.

    Only inner and left joins are supported: the right side is replicated
    ``salt`` times, so right/full outer would emit each unmatched right row
    once per replica instead of once.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn(SALT_COL, lsalt)
    r = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [on, SALT_COL], how).drop(SALT_COL)


#: routing thresholds — IDENTICAL to dq_join_skew_profile's
#: recommendation column (plans/dq.py), so the profiler's advice and the
#: runtime decision can never drift apart
BROADCAST_KEY_CEILING = 1000
SALT_SKEW_FACTOR = 10
SALT_CAP = 64


def choose_route(
    n_rows: int,
    n_keys: int,
    max_mult: int,
    dim_rows: int,
    parallelism: int = 32,
) -> tuple[str, int]:
    """The profile -> plan-decision function, shared by the profiler
    query's ``recommendation`` column and :func:`route_join`: a
    <=1000-ROW dimension broadcasts (``dim_rows`` is the MEASURED right
    side — the thing actually shipped to every executor; the fact key's
    distinct count says nothing about dimension size when the dim
    carries keys the fact never references); a key whose max
    multiplicity is >10x the mean salts; otherwise plain hash
    partitioning. The profiler query, which reports on ONE relation
    with no concrete dim in hand, passes ``dim_rows = n_keys`` — the
    row count of the smallest dim that could satisfy the join, i.e. its
    recommendation reads "a (deduplicated) dimension on this key would
    broadcast". The salt factor is the smallest integer spreading the
    hot key's rows down to the average reduce-partition size —
    ceil(max_mult * parallelism / n_rows), integer arithmetic so any
    engine recomputes it exactly — clamped to [2, SALT_CAP] (beyond the
    cap the dim replication cost dominates what the extra spread
    buys)."""
    if dim_rows <= BROADCAST_KEY_CEILING:
        return "broadcast_dim", 0
    if max_mult * n_keys > SALT_SKEW_FACTOR * n_rows:
        salt = (max_mult * parallelism + n_rows - 1) // n_rows
        return "salt", min(SALT_CAP, max(2, salt))
    return "hash_ok", 0


def route_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    parallelism: int = 32,
    how: str = "inner",
) -> tuple[DataFrame, dict]:
    """Profile-ROUTED equi-join: measure the left side's key distribution
    (one partial-aggregated pass — per-key counts reduce to three
    scalars, a bounded driver-side decision input by the same contract
    as kmeans centers) AND the right side's row count (the broadcast
    decision must see the frame it would ship, not an inference from the
    fact's keys), feed both through :func:`choose_route`, and build the
    plan the profile asks for — ``broadcast(right)``, a
    :func:`salted_join` with the computed factor, or the plain join.
    Returns ``(joined, decision)`` where ``decision`` carries
    route/salt/n_rows/n_keys/max_mult/dim_rows so callers can emit the
    routing as data (the registered query's oracle recomputes the
    identical CASE).

    Only inner and left joins are accepted — validated UP FRONT, because
    the salt branch cannot honor right/full outer (salted_join
    replicates the right side) and Spark cannot honor a broadcast hint
    on the preserved side: an outer join must not crash or silently
    degrade only on the data distributions that happen to route there.

    This is the DETECT -> MITIGATE wiring the skew playbook describes:
    dq_join_skew_profile computes exactly these statistics as a report;
    here they drive the physical plan, and the result is provably
    identical to the unsalted join (pytest-pinned; BENCH_SKEW.md's
    "routed" row measures the win on the planted power-law key). At
    100 TB the profile pass amortizes trivially: the fact leg reads one
    column with a |distinct keys| shuffle and the dim count is
    metadata-cheap, while the straggler they prevent is the join
    stage's entire wall-clock."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"route_join supports inner/left joins only, got {how!r}")
    stats = (
        left.groupBy(F.col(on))
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(
            F.sum("m").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("m").cast("long").alias("max_mult"),
        )
        .collect()[0]
    )
    n_rows, n_keys, max_mult = (
        int(stats["n_rows"] or 0),
        int(stats["n_keys"] or 0),
        int(stats["max_mult"] or 0),
    )
    dim_rows = right.count()
    route, salt = choose_route(n_rows, n_keys, max_mult, dim_rows, parallelism)
    decision = {
        "route": route,
        "salt": salt,
        "n_rows": n_rows,
        "n_keys": n_keys,
        "max_mult": max_mult,
        "dim_rows": dim_rows,
    }
    if route == "broadcast_dim":
        return left.join(F.broadcast(right), on, how), decision
    if route == "salt":
        return salted_join(left, right, on=on, salt=salt, how=how), decision
    return left.join(right, on, how), decision


def salted_agg_sum(
    df: DataFrame, key: str, value: str, salt: int = 16, out: str = "total"
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial sums per
    (key, salt) spread the hot key across reducers, then a tiny final
    aggregate merges the partials.

    WHEN THIS PAYS — measured crossover in BENCH_SKEW.md: for O(1)-state
    aggregates (sum/count/avg) Spark's map-side partials already collapse
    a hot key to one row per map task, so this rewrite LOSES at any scale
    where the per-group state fits in memory (0.81 s naive vs 1.41 s
    salted on the planted fixture) — it exists for state-explosive shapes
    only: a group whose accumulator outgrows one executor, or
    O(cardinality)-state aggregates, where :func:`salted_agg_count_distinct`
    is the right form (measured winning 3.2x on the same fixture).

    The salt is a ROW-uniform counter (monotonically_increasing_id mod
    salt — consecutive per partition, so perfectly uniform), NOT a hash of
    the value: a hot key whose values have low cardinality (a 0/1 flag, a
    constant) would hash to a handful of salt buckets and land right back
    on one reducer. Salt assignment may differ across task retries; the
    final sum is invariant to it (addition reassociates — see the caller's
    exactness note for integer-valued doubles)."""
    salted = df.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    partial = salted.groupBy(key, SALT_COL).agg(F.sum(value).alias("__part"))
    return partial.groupBy(key).agg(F.sum("__part").alias(out))


def salted_agg_count_distinct(
    df: DataFrame, key: str, value: str, salt: int = 16, out: str = "n_distinct"
) -> DataFrame:
    """Two-stage EXACT count-distinct for skewed group keys — the
    aggregation where salting actually pays (BENCH_SKEW.md "when salting
    pays" section). For plain ``sum``, map-side partial aggregation
    already collapses a hot key to one row per map task, so
    :func:`salted_agg_sum` only buys anything once a single group's
    reduce-side STATE outgrows an executor; for ``count_distinct`` the
    reduce side must materialize every distinct (key, value) pair of the
    hot key on ONE reducer — state O(group cardinality), the planted
    fixture measures the salted form winning 3.2x there (11.1 -> 3.5 s).

    Unlike salted_agg_sum's row-uniform salt, the salt here MUST be a
    hash of the VALUE: distinct counts add across buckets only if the
    buckets PARTITION the value space (the same value may never appear
    under two salts). Rows with NULL values fall into a NULL salt bucket
    whose count_distinct contributes 0 — exactly count_distinct's own
    NULL semantics."""
    salted = df.withColumn(SALT_COL, F.pmod(F.xxhash64(F.col(value)), F.lit(salt)))
    partial = salted.groupBy(key, SALT_COL).agg(
        F.count_distinct(value).alias("__part")
    )
    return partial.groupBy(key).agg(F.sum("__part").cast("long").alias(out))
