"""Connected components over a pair/edge frame (dedup clustering).

Near-dup detection emits PAIRS; deleting duplicates needs CLUSTERS —
transitively closed groups with one keeper each (A~B and B~C must collapse
to one survivor even when A~C was never directly detected). This is the
standard last step of a corpus dedup pipeline.

Algorithm: iterative minimum-label propagation. Every vertex starts
labeled with itself; each round every vertex takes the min of its own and
its neighbors' labels; converged when no label changes. Rounds needed =
graph diameter, and near-dup clusters are shallow (a handful of hops), so
3-5 rounds close real corpora. Each round is one shuffle-join + one
aggregate — all data stays distributed; the driver sees only the one-row
convergence count per round. Lineage is cut with localCheckpoint between
rounds (at cluster scale, a checkpoint dir on the DFS does the same job);
without it the plan doubles every iteration and Catalyst re-plans the
whole history.

Both variants are HIERARCHICAL: distributed rounds run only while the
(contracted) edge set exceeds ``_LOCAL_SOLVE_EDGES``; below that, the
remaining rounds collapse into one single-task union-find
(:func:`_solve_local`) — per-round shuffle/job overhead dominates actual
work there, and the near-dup edge set (the OUTPUT of detection) is
orders of magnitude smaller than the corpus to begin with.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: edges per propagation partition — sized so one partition's join state
#: (edge rows + the matching label rows) stays comfortably inside a few
#: hundred MB of executor memory at cluster scale
_EDGES_PER_PARTITION = 2_000_000

#: hierarchical finish threshold: once the (contracted) edge set is at most
#: this many rows, the remaining rounds are solved by a SINGLE-task
#: union-find instead of more shuffle rounds. Near-dup edge sets are the
#: OUTPUT of detection — orders of magnitude smaller than the corpus — and
#: contraction shrinks them further every round, so at 100 TB the loop runs
#: a handful of distributed rounds and the tail (where per-round job/shuffle
#: overhead dominates actual work) collapses into one small task.
#: Sizing is PYTHON-side, not columnar: 1M edges => up to 2M parent-dict
#: entries at ~100 B each (int key + value + dict slot) ≈ 250 MB peak in
#: the one Python worker running the task — inside a default
#: spark.executor.pyspark.memory budget with margin. Raising this means
#: re-doing that arithmetic, not the on-disk size of the edges.
_LOCAL_SOLVE_EDGES = 1_000_000


def chain_graph(spark, n_components: int, chain_len: int) -> DataFrame:
    """Deterministic planted-component edge set for CC scale stress:
    ``n_components`` disjoint chains of ``chain_len`` vertices (component
    ``c`` owns ids ``[c*chain_len, (c+1)*chain_len)``; edges connect
    consecutive ids). Ground truth is closed-form — ``component(v) =
    chain_len * floor(v / chain_len)`` — so a run over millions of edges
    is verifiable without a second solver. Chains are the ADVERSARIAL
    shape for label propagation (diameter = chain_len - 1 rounds) and the
    showcase for large-star/small-star's multiplicative contraction; they
    model chained near-dup template families (A~B~C with no direct A~C
    edge), which is exactly the case clustering exists for. Pure
    ``spark.range`` arithmetic: generating 10M edges is milliseconds and
    fully distributed."""
    return (
        spark.range(n_components * chain_len)
        .where((F.col("id") % chain_len) != chain_len - 1)
        .select(
            F.col("id").alias("doc_id_1"),
            (F.col("id") + 1).alias("doc_id_2"),
        )
    )


def _solve_local(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Single-task min-label union-find over an edge frame known to fit in
    one executor partition (caller guarantees ``count <= _LOCAL_SOLVE_EDGES``).

    Union-by-minimum keeps the smallest vertex as every tree's root, so the
    result matches the distributed algorithms' (vertex, component=min)
    contract exactly, for any orderable id type. Self-loop rows are legal
    and register their vertex as a singleton.
    """
    vtype = dict(edges.dtypes)[a]

    def solve(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            # .tolist() yields native Python ints/strs — iterating the
            # Series directly would box one numpy scalar per cell (~3x the
            # dict memory) and compare slower
            for x, y in zip(pdf[a].tolist(), pdf[b].tolist()):
                if x not in parent:
                    parent[x] = x
                if y not in parent:
                    parent[y] = y
                rx, ry = find(x), find(y)
                if rx == ry:
                    continue
                if ry < rx:
                    rx, ry = ry, rx
                parent[ry] = rx
        verts = list(parent)
        for i in range(0, len(verts), 100_000):  # bounded Arrow batches
            chunk = verts[i : i + 100_000]
            yield pd.DataFrame(
                {"vertex": chunk, "component": [find(v) for v in chunk]}
            )

    return edges.repartition(1).mapInPandas(
        solve, f"vertex {vtype}, component {vtype}"
    )


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a localCheckpoint's storage. Superseded
    per-round checkpoints otherwise stay persisted until driver GC triggers
    the ContextCleaner — with a large driver heap that can be never, and
    iterative callers leak one RDD per round (measured: +4 persistent RDDs
    per clustering run). The checkpointed RDD sits behind the DataFrame's
    LogicalRDD node; reach it via py4j and drop the blocks."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # plan shape changed across Spark versions: leak, don't fail


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Label every vertex of the undirected ``edges`` graph with the
    smallest vertex id in its component. Returns (vertex, component).

    Vertices are those appearing in any edge; isolated docs (no near-dup
    edge) are their own component by definition and never enter the graph,
    so callers left-join the result back onto the corpus.

    ``stats`` (optional dict) is populated in place with the execution
    shape — {"mode": "local"|"distributed", "n_edges", "n_partitions",
    "rounds": [{"round", "changed", "secs"}, ...]} — so scale benches can
    record round counts and per-round work without re-instrumenting the
    operator. ``changed`` rides the SAME single per-round job (the
    convergence aggregate sums label improvements instead of max-ing a
    boolean), so instrumentation adds zero actions.
    """
    # canonical high->low orientation first: half the rows of the symmetric
    # form, and exactly what the single-task finish consumes. Self-loops are
    # kept (they register isolated-but-edged vertices as singletons).
    canon = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    # Hierarchical finish: near-dup edge sets are the OUTPUT of detection —
    # orders of magnitude smaller than the corpus — so when the whole graph
    # already fits one task, diameter-many shuffle rounds are pure overhead.
    # The count is cheap (canon is already materialized).
    n_edges = canon.count()
    if stats is not None:
        stats.update(n_edges=n_edges, rounds=[])
    if n_edges <= _LOCAL_SOLVE_EDGES:
        if stats is not None:
            stats["mode"] = "local"
        out = _solve_local(canon)
        return out
    # Right-size the iterative phase's parallelism from the measured edge
    # count. AQE re-plans shuffle widths *within* one job but every
    # propagation round below is its own action, so the session-wide width
    # (32 in tests, thousands on a cluster) would be re-paid ~diameter times.
    sym = canon.where(F.col("a") != F.col("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    n_part = max(1, min(canon.rdd.getNumPartitions(), n_edges // _EDGES_PER_PARTITION + 1))
    sym = sym.repartition(n_part, "b").localCheckpoint()
    if stats is not None:
        stats.update(mode="distributed", n_partitions=n_part)
    labels = canon.select(F.col("a").alias("vertex")).union(
        canon.select(F.col("b").alias("vertex"))
    ).distinct().select(
        "vertex", F.col("vertex").alias("component")
    ).localCheckpoint()
    _unpersist_checkpoint(canon)

    converged = False
    prev_ckpt = labels  # the checkpointed frame itself (not a projection of it)
    for round_no in range(max_iter):
        t0 = time.monotonic()
        nbr_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        # lazy checkpoint + one full-scan aggregate = ONE job per round: the
        # sum(__improved) scan materializes every checkpoint partition AND
        # returns the convergence signal (the changed-label count — same
        # single job a boolean max would cost, but it doubles as the
        # per-round work metric for scale benches), where an eager
        # checkpoint followed by a separate probe action paid two driver
        # round-trips per iteration
        proposed = (
            labels.join(nbr_min, labels.vertex == nbr_min.a, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("__improved"),
            )
            .localCheckpoint(eager=False)
        )
        changed = proposed.agg(
            F.sum(F.col("__improved").cast("long")).alias("__i")
        ).first()["__i"]
        _unpersist_checkpoint(prev_ckpt)  # superseded round's blocks
        prev_ckpt = proposed
        labels = proposed.drop("__improved")
        if stats is not None:
            stats["rounds"].append(
                {
                    "round": round_no,
                    "changed": int(changed or 0),
                    "secs": round(time.monotonic() - t0, 3),
                }
            )
        if not changed:
            converged = True
            break
    _unpersist_checkpoint(sym)
    if not converged:
        # returning non-minimal labels would silently split one true
        # cluster into several (dedup then keeps extra copies) — fail loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the graph has a component with diameter > max_iter — raise it"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — the
    adversarial-depth alternative to :func:`connected_components`.

    Label propagation needs diameter-many rounds: a 10^6-node chain means
    10^6 shuffles. Large-star/small-star contracts path length
    multiplicatively, converging in O(log n) rounds on ANY graph shape, so
    it is the right choice when the near-dup graph's diameter is unknown
    (chained template families, crawl rings). Per round: two
    groupBy-min + join steps, all distributed; convergence is detected by
    edge-set fixpoint (count + checksum — one 1-row driver scalar), not by
    collecting edges.

    Returns (vertex, component) with component = min vertex id of the
    component, the same contract as :func:`connected_components`.

    ``stats`` (optional dict) records the execution shape — mode,
    initial edge count, per-round contracted edge counts + wall seconds,
    and whether the hierarchical local finish fired — the per-round edge
    count IS the round's shuffle volume (each star round shuffles the
    current edge set through two groupBy-min + join steps).
    """

    def large_star(e: DataFrame) -> DataFrame:
        """Connect every strictly-larger neighbor of u to min(N(u) + {u}).

        No intermediate distincts: ``e`` arrives deduplicated in canonical
        (a > b) orientation each round, so the two union directions cannot
        collide; duplicate (v, m) emissions are collapsed by small_star's
        oriented distinct."""
        nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
        return (
            nbrs.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        """Orient edges high->low; connect each low neighbor (and u) to the
        minimum of u's low neighborhood."""
        oriented = e.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).distinct()
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        low = (
            oriented.join(m, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        self_edge = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
        return (
            low.union(self_edge)
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    # one materialization of the (possibly expensive) upstream edge pipeline:
    # canon keeps self-loops so BOTH the vertex set and the loop input derive
    # from this single checkpoint — deriving vertices from raw ``edges``
    # would re-evaluate the whole near-dup detection a second time
    canon = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    cur = canon.where(F.col("a") != F.col("b"))
    vertices = (
        canon.select(F.col("a").alias("vertex"))
        .union(canon.select(F.col("b").alias("vertex")))
        .distinct()
        .localCheckpoint()
    )

    def finish(labels: DataFrame) -> DataFrame:
        # fixpoint / locally-solved edges are (vertex, component-min) stars;
        # vertices absent from them (component minima, pure-self-loop docs)
        # label themselves
        return vertices.join(labels, "vertex", "left").select(
            "vertex",
            F.coalesce("component", F.col("vertex")).alias("component"),
        )

    # Hierarchical finish, round 0: if the whole edge set already fits one
    # task, skip the distributed rounds entirely (see _LOCAL_SOLVE_EDGES).
    n0 = cur.count()
    if stats is not None:
        stats.update(n_edges=n0, rounds=[])
    if n0 <= _LOCAL_SOLVE_EDGES:
        if stats is not None:
            stats["mode"] = "local"
        return finish(_solve_local(cur))
    if stats is not None:
        stats["mode"] = "distributed"

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.xxhash64("a", "b")).cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        return (row["n"], None if row["h"] is None else int(row["h"]))

    prev_fp = None
    converged = False
    for round_no in range(max_iter):
        t0 = time.monotonic()
        # lazy checkpoint + the fingerprint aggregate = ONE job per round
        # (an eager checkpoint would be a second materializing action)
        prev = cur
        cur = small_star(large_star(cur)).localCheckpoint(eager=False)
        fp = fingerprint(cur)
        # superseded blocks: round 0's input is a filter over canon (the
        # filter itself holds no storage), so release canon directly
        _unpersist_checkpoint(canon if round_no == 0 else prev)
        if stats is not None:
            stats["rounds"].append(
                {
                    "round": round_no,
                    "n_edges": fp[0],
                    "secs": round(time.monotonic() - t0, 3),
                }
            )
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
        # Hierarchical finish: star rounds contract the edge set
        # multiplicatively; once the remainder fits one task, stop paying
        # per-round shuffle+job overhead. Contraction preserves both
        # connectivity and each component's minimum vertex, so the local
        # union-find over the contracted edges yields the original labels.
        if fp[0] <= _LOCAL_SOLVE_EDGES:
            if stats is not None:
                stats["local_finish"] = True
            return finish(_solve_local(cur))
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    return finish(
        cur.select(F.col("a").alias("vertex"), F.col("b").alias("component"))
    )
