"""Generate PLAN_AUDIT.md: a physical-plan audit of every registered query.

For each query the audit records, straight from Catalyst's executed plan:
- join strategies used (broadcast-hash / sort-merge / shuffled-hash /
  nested-loop / cartesian),
- exchange (shuffle) count — the scale currency,
- Python evaluation nodes (Arrow-batched vs row-at-a-time),
- whether the parquet scan pushes filters / prunes columns.

This formalizes the per-round manual plan review: an anti-pattern that
appears here (a CartesianProduct in a bucketed query, a BatchEvalPython in
a JVM family, a scan with no ReadSchema pruning) is visible in one diffable
artifact. Run: python tools/gen_plan_audit.py
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SF_DIR = "/root/testdata/sf0.001"

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "TransformWithStateInPandas",
    "PythonUDTF",
    "MapInArrow",
)


def _strip_initial_plans(plan: str) -> str:
    """Drop AQE's ``== Initial Plan ==`` sections: the executed-plan string
    prints BOTH the final (executing) plan and the pre-adaptive initial
    plan for every AdaptiveSparkPlan node, so a naive node count doubles —
    and a plan that references a cached frame N times reprints the cached
    subtree's whole AQE section N times (measured: the 3-iteration
    PageRank query printed 63 Initial-Plan sections, inflating its join
    count 132 vs the real 2-joins-per-iteration shape). A section ends at
    the first line back at (or above) the header's indentation."""
    out: list[str] = []
    skip_col: int | None = None
    for line in plan.splitlines():
        if not line.strip():
            if skip_col is None:
                out.append(line)
            continue
        m = re.search(r"[+:]- ", line)
        col = m.start() if m else len(line) - len(line.lstrip())
        if skip_col is not None:
            if col > skip_col:
                continue
            skip_col = None
        if "== Initial Plan ==" in line:
            skip_col = col
            continue
        out.append(line)
    return "\n".join(out)


def _split_cached(plan: str) -> tuple[str, str]:
    """Split the (initial-plan-stripped) plan text into (live, cached)
    line sets: cached = subtrees under an InMemoryRelation. A cached
    (persisted) subtree's shuffles run once at materialization — e.g. the
    shared learned-quantizer cell map or PageRank's degree-annotated edge
    list — and every later execution reads the InMemoryTableScan instead,
    so counting its nodes per-query would overstate the steady-state
    cost. Subtree extent is recovered from the plan text's tree
    indentation (child nodes print strictly deeper than their parent's
    branch marker).

    Every REFERENCE to a cached frame reprints its subtree, so identical
    cached blocks are deduplicated (keyed on their dedented text) — the
    returned cached text carries each distinct materialization once."""
    live: list[str] = []
    blocks: list[list[str]] = []
    skip_col: int | None = None
    for line in plan.splitlines():
        if not line.strip():
            continue
        m = re.search(r"[+:]- ", line)
        # markerless lines (wrapped node text, section headers) fall back
        # to their indentation so a deep continuation can't end the skip
        col = m.start() if m else len(line) - len(line.lstrip())
        if skip_col is not None:
            if col > skip_col:
                blocks[-1].append(line.strip())
                continue
            skip_col = None
        if "InMemoryRelation" in line:
            skip_col = col
            blocks.append([line.strip()])
            continue
        live.append(line)
    uniq = {"\n".join(b) for b in blocks}
    return "\n".join(live), "\n".join(sorted(uniq))


def audit_plan(plan: str) -> dict:
    """Count nodes on the FINAL (executing) plan only, split into live
    per-execution cost vs once-per-session cached-subtree cost."""
    stripped = _strip_initial_plans(plan)
    live, cached_part = _split_cached(stripped)
    counts = Counter()
    for node in JOIN_NODES + PY_NODES:
        n = len(re.findall(rf"\b{node}\b", live))
        if n:
            counts[node] = n
    return {
        "joins": {n: c for n, c in counts.items() if n in JOIN_NODES},
        "python": {n: c for n, c in counts.items() if n in PY_NODES},
        "exchanges": len(re.findall(r"\bExchange\b", live)),
        "exchanges_total": len(re.findall(r"\bExchange\b", live))
        + len(re.findall(r"\bExchange\b", cached_part)),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "pruned_scan": bool(re.search(r"ReadSchema: struct<[^>]+>", plan)),
    }


def main() -> None:
    from custom_python_etl_data_connector_rohitharumugams_spark import plans
    from custom_python_etl_data_connector_rohitharumugams_spark.session import get_spark

    spark = get_spark("plan-audit", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    qdefs = plans.all_queries()

    rows = []
    for name in sorted(qdefs):
        df = qdefs[name].fn(spark, SF_DIR)
        # EXECUTE before auditing: the pre-adaptive plan string prints
        # BOTH sides of a self-join whose exchanges AQE's stage cache
        # dedupes at runtime (ReusedExchange), and shows sort-merge
        # joins that adaptive planning converts to broadcast — the
        # audited shape must be what actually ran, not the static worst
        # case (measured: llm_ngram_jaccard_pairs prints 11 exchanges
        # statically but executes 7 with the whole postings pipeline
        # materialized once).
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit_plan(plan)
        rows.append((name, qdefs[name].tags, a))

    out = [
        "# PLAN AUDIT — physical-plan summary of every registered query",
        "",
        f"Generated by tools/gen_plan_audit.py at {SF_DIR} "
        "(EXECUTED adaptive final plans — runtime exchange reuse and "
        "AQE join conversions included; plan shapes, not timings).",
        "Columns: joins used / live shuffle (Exchange) count — excludes",
        "once-per-session cached (InMemoryRelation) subtrees, shown as +N",
        "when present, and runtime-reused (ReusedExchange) stages /",
        "Python eval nodes / parquet filter pushdown seen / pruned scan.",
        "",
        "| query | tags | joins | xchg | python | pushdown | pruned |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, tags, a in rows:
        joins = ", ".join(f"{k}x{v}" for k, v in sorted(a["joins"].items())) or "—"
        pyn = ", ".join(f"{k}x{v}" for k, v in sorted(a["python"].items())) or "—"
        cached = a["exchanges_total"] - a["exchanges"]
        xchg = f"{a['exchanges']}+{cached}c" if cached else f"{a['exchanges']}"
        out.append(
            f"| {name} | {' '.join(tags)} | {joins} | {xchg} | {pyn} "
            f"| {'y' if a['pushed_filters'] else '-'} "
            f"| {'y' if a['pruned_scan'] else '-'} |"
        )

    n_cart = sum(1 for _, _, a in rows if a["joins"].get("CartesianProduct"))
    out += [
        "",
        f"Totals: {len(rows)} queries; {n_cart} with CartesianProduct "
        "(expected 0); row-level nested-loop legality is asserted in "
        "tests/test_scale_patterns.py (scalar sides and documented exact "
        "baselines only); Python-node legality in "
        "test_no_python_in_unexpected_query_plans.",
        "",
    ]
    (_REPO / "PLAN_AUDIT.md").write_text("\n".join(out))
    print(f"wrote PLAN_AUDIT.md: {len(rows)} queries, {n_cart} cartesian")
    spark.stop()


if __name__ == "__main__":
    main()
