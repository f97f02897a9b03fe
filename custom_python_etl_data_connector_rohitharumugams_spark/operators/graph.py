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
