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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: edges per propagation partition — sized so one partition's join state
#: (edge rows + the matching label rows) stays comfortably inside a few
#: hundred MB of executor memory at cluster scale
_EDGES_PER_PARTITION = 2_000_000


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected ``edges`` graph with the
    smallest vertex id in its component. Returns (vertex, component).

    Vertices are those appearing in any edge; isolated docs (no near-dup
    edge) are their own component by definition and never enter the graph,
    so callers left-join the result back onto the corpus.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Right-size the iterative phase's parallelism from the measured edge
    # count. AQE re-plans shuffle widths *within* one job but every
    # propagation round below is its own action, so the session-wide width
    # (32 in tests, thousands on a cluster) would be re-paid ~diameter
    # times even when the near-dup graph is tiny — and it usually is: edges
    # are the OUTPUT of near-dup detection, orders of magnitude smaller
    # than the corpus. The count is cheap (sym is already materialized).
    n_edges = sym.count()
    n_part = max(1, min(sym.rdd.getNumPartitions(), n_edges // _EDGES_PER_PARTITION + 1))
    sym = sym.repartition(n_part, "b").localCheckpoint()
    labels = sym.select("a").distinct().select(
        F.col("a").alias("vertex"), F.col("a").alias("component")
    ).localCheckpoint()

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        # lazy checkpoint + one full-scan aggregate = ONE job per round: the
        # max(__improved) scan materializes every checkpoint partition AND
        # returns the convergence bit, where an eager checkpoint followed by
        # a separate probe action paid two driver round-trips per iteration
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
        improved = proposed.agg(F.max("__improved").alias("__i")).first()["__i"]
        labels = proposed.drop("__improved")
        if not improved:
            converged = True
            break
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

    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        edges.select(F.col(src).alias("vertex"))
        .union(edges.select(F.col(dst).alias("vertex")))
        .distinct()
        .localCheckpoint()
    )

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
    for _ in range(max_iter):
        # lazy checkpoint + the fingerprint aggregate = ONE job per round
        # (an eager checkpoint would be a second materializing action)
        cur = small_star(large_star(cur)).localCheckpoint(eager=False)
        fp = fingerprint(cur)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint edges are (vertex, component-min) stars; isolated-in-graph
    # vertices (every neighbor larger, no incoming star edge... cannot
    # happen at fixpoint except for component minima) label themselves
    labels = cur.select(F.col("a").alias("vertex"), F.col("b").alias("component"))
    return (
        vertices.join(labels, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("component", F.col("vertex")).alias("component"),
        )
    )
