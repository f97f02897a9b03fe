"""Skew scale-stress bench: salted vs AQE-split vs naive plans on a
planted power-law key (operators/skew.py — BENCH_SKEW.md).

The registered queries exercise salting only on uniform fixtures where it
wins nothing, so this bench plants the pathology the helpers exist for:
ONE key carrying ~40% of a multi-million-row fact side, joined against a
non-broadcastable dim. Three executions of the IDENTICAL logical join:

- naive:   AQE skew-split disabled — the hot key's rows collapse onto one
           sort-merge reducer (the straggler that kills wall-clock at
           1000 executors);
- aqe:     AQE skew-join enabled (skew factor/threshold tuned to the
           fixture) — the runtime splits the oversized partition;
- salted:  operators/skew.salted_join — the explicit rewrite for when the
           engine can't see the skew (or for skewed AGG state).

All three must produce identical aggregates (integer arithmetic — exact),
and the salted/AQE runs must beat the naive straggler. The same fixture
also stress-runs salted_agg_sum vs the naive hot-key aggregation.

Usage: python tools/bench_skew.py [--rows 16000000] [--keys 100000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

HOT_FRACTION_PCT = 40  # id % 10 < 4


def build_fixture(spark, n_rows: int, n_keys: int):
    """Deterministic planted power-law join inputs. The hot key is
    ``n_keys`` (disjoint from the cold range 0..n_keys-1); 4 of every 10
    fact rows carry it. Values are small integers so every aggregate is
    exact and scenario results are bit-comparable."""
    from pyspark.sql import functions as F

    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 10 < 4, F.lit(n_keys))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).cast("long").alias("v"),
        # high-cardinality value for the distinct-heavy agg twin: the hot
        # group's distinct set is ~ its row count, so reduce-side state is
        # O(group size) — the regime where salting pays
        F.col("id").alias("v2"),
    )
    dim = spark.range(n_keys + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("long").alias("w"),
        # pad the dim so Spark can't be tempted to broadcast it even if a
        # future conf tweak re-enables auto-broadcast
        F.concat(F.lit("label-"), F.col("id")).alias("lab"),
    )
    return fact, dim


def consume_join(joined) -> tuple[tuple, str]:
    """Fully evaluate the join through an exact integer aggregate; returns
    (result, final adaptive plan text) — the plan must come from the frame
    that EXECUTED, or AQE's runtime decisions (the skew split) won't be in
    it (isFinalPlan=false)."""
    from pyspark.sql import functions as F

    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v") * F.col("w")).alias("vw"),
        F.sum("v").alias("sv"),
    )
    row = agg.collect()[0]
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return (row["n"], row["vw"], row["sv"]), plan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--salt", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from custom_python_etl_data_connector_rohitharumugams_spark.operators import (
        skew as K,
    )
    from custom_python_etl_data_connector_rohitharumugams_spark.session import (
        get_spark,
    )

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # a broadcast join would sidestep the skew entirely and measure nothing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def _routed_capture(K, fact, dim, sink: list):
        joined, dec = K.route_join(fact, dim, on="k", parallelism=32)
        sink.append(dec)
        return joined

    routed_decisions: list[dict] = []

    fact, dim = build_fixture(spark, args.rows, args.keys)
    # materialize inputs once so scenario timings measure the JOIN, not the
    # fixture projection
    fact = fact.persist()
    dim = dim.persist()
    fact.count(), dim.count()

    def run(label: str, conf: dict, join_fn) -> dict:
        """min-of-reps timing: this host exhibits multi-second stalls (see
        bench.py's documented stall protocol), so a single sample can
        triple; the minimum is the reproducible cost."""
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            secs, result, plan = None, None, None
            for _ in range(args.reps):
                # join_fn() runs INSIDE the timed window: for the lazy
                # scenarios it costs microseconds of plan building, but
                # the routed scenario's profiling .collect() is part of
                # the end-to-end cost it claims to measure — charging it
                # outside the window overstated the routed speedup
                t0 = time.monotonic()
                result, plan = consume_join(join_fn())
                t = time.monotonic() - t0
                secs = t if secs is None else min(secs, t)
            return {
                "label": label,
                "secs": secs,
                "result": result,
                "skew_split": "skew=true" in plan,
                "smj": "SortMergeJoin" in plan,
            }
        finally:
            for k in conf:
                spark.conf.unset(k)

    scenarios = [
        run(
            "naive (skew-split off)",
            {"spark.sql.adaptive.skewJoin.enabled": "false"},
            lambda: fact.join(dim, "k"),
        ),
        run(
            "aqe skew-join",
            {
                "spark.sql.adaptive.skewJoin.enabled": "true",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            },
            lambda: fact.join(dim, "k"),
        ),
        run(
            "salted_join",
            {"spark.sql.adaptive.skewJoin.enabled": "false"},
            lambda: K.salted_join(fact, dim, on="k", salt=args.salt),
        ),
        # the DETECT -> MITIGATE wiring: route_join profiles the fact
        # side AND counts the dim, chooses the salt branch (hot key >>
        # threshold, dim over the broadcast ceiling) with its COMPUTED
        # factor, and must beat the naive straggler end to end — the
        # profile passes run inside the timed window (see run())
        run(
            "routed (profile->salt)",
            {"spark.sql.adaptive.skewJoin.enabled": "false"},
            lambda: _routed_capture(K, fact, dim, routed_decisions),
        ),
    ]
    routed_dec = routed_decisions[-1]
    assert routed_dec["route"] == "salt", routed_dec

    results = {s["result"] for s in scenarios}
    assert len(results) == 1, f"scenario results diverge: {scenarios}"

    # deterministic straggler metric, independent of this host's timing
    # noise: the share of fact rows landing on the heaviest reduce
    # partition under each plan's shuffle key — pmod(hash(keys), P) is
    # exactly Spark's HashPartitioning placement. On a real cluster the
    # join stage's wall-clock is proportional to this share.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def max_share(*cols) -> float:
        top = (
            fact.groupBy(F.pmod(F.hash(*cols), F.lit(n_part)).alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        return top / args.rows

    naive_share = max_share("k")
    salted_share_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(args.salt)
    )
    salted_share = max_share("k", salted_share_col.alias("__salt"))

    # skewed-aggregation twin: one hot group's reduce state
    def agg_run(label: str, frame_fn) -> dict:
        t0 = time.monotonic()
        rows = frame_fn().collect()
        secs = time.monotonic() - t0
        return {
            "label": label,
            "secs": secs,
            "result": tuple(sorted((r[0], r[1]) for r in rows))[:3],
            "n_groups": len(rows),
        }

    hot = fact.where(F.col("k") >= args.keys - 5)  # hot key + a few cold
    aggs = [
        agg_run(
            "naive groupBy sum (state O(1)/group)",
            lambda: hot.groupBy("k").agg(F.sum("v").alias("total")),
        ),
        agg_run(
            "salted_agg_sum",
            lambda: K.salted_agg_sum(hot, key="k", value="v", salt=32),
        ),
    ]
    assert aggs[0]["result"] == aggs[1]["result"], f"agg results diverge: {aggs}"
    # the distinct-heavy twin: reduce-side state is O(group cardinality),
    # the regime where salting actually pays (crossover documented below)
    daggs = [
        agg_run(
            "naive count_distinct (state O(card)/group)",
            lambda: hot.groupBy("k").agg(
                F.count_distinct("v2").alias("n_distinct")
            ),
        ),
        agg_run(
            "salted_agg_count_distinct",
            lambda: K.salted_agg_count_distinct(hot, key="k", value="v2", salt=32),
        ),
    ]
    assert daggs[0]["result"] == daggs[1]["result"], (
        f"distinct agg results diverge: {daggs}"
    )
    aggs += daggs

    naive, aqe, salted, routed = scenarios
    lines = [
        "# BENCH_SKEW — planted power-law key: salted vs AQE-split vs naive",
        "",
        f"Generated by tools/bench_skew.py: {args.rows:,} fact rows, ONE hot "
        f"key carrying {HOT_FRACTION_PCT}% of them ({args.rows * 4 // 10:,} "
        f"rows), {args.keys:,} cold keys, dim side non-broadcastable "
        "(auto-broadcast disabled). Identical logical join executed four "
        "ways on local[32]; all four produced byte-identical integer "
        "aggregates (asserted, or this file would not exist). The `routed` "
        "row is operators/skew.route_join consuming the profile end to "
        "end — its timing INCLUDES the profiling passes (fact key stats "
        "+ dim count): it chose the salt branch with computed factor "
        f"{routed_dec['salt']} (ceil(max_mult*32/n_rows)) from measured "
        f"stats n_rows={routed_dec['n_rows']:,} n_keys={routed_dec['n_keys']:,} "
        f"max_mult={routed_dec['max_mult']:,} "
        f"dim_rows={routed_dec['dim_rows']:,}.",
        "",
        "| scenario | secs | skew-split in plan | result identical |",
        "|---|---|---|---|",
    ]
    for s in scenarios:
        lines.append(
            f"| {s['label']} | {s['secs']:.2f} | "
            f"{'y' if s['skew_split'] else '-'} | y |"
        )
    lines += [
        "",
        f"Speedup vs naive straggler: AQE split {naive['secs'] / aqe['secs']:.2f}x, "
        f"salted_join {naive['secs'] / salted['secs']:.2f}x, "
        f"routed {naive['secs'] / routed['secs']:.2f}x "
        f"(salt={args.salt}, min of {args.reps} runs per scenario — this "
        "host's documented multi-second stalls make single samples "
        "unusable).",
        "",
        "## straggler balance (deterministic, host-independent)",
        "",
        "Share of fact rows on the heaviest reduce partition under each "
        f"plan's shuffle key (pmod(hash(keys), {n_part}) — exactly Spark's "
        "HashPartitioning placement; on a 1000-executor cluster the join "
        "stage's wall-clock is proportional to this number):",
        "",
        "| plan | max reduce-partition share |",
        "|---|---|",
        f"| naive hash(k) | {naive_share:.1%} |",
        f"| salted hash(k, salt) | {salted_share:.1%} |",
        f"| AQE skew split | bounded by advisoryPartitionSizeInBytes "
        "(plan shows skew=true) |",
        "",
        "## skewed aggregation (one hot group's reduce-side state)",
        "",
        "| scenario | secs |",
        "|---|---|",
    ] + [f"| {a['label']} | {a['secs']:.2f} |" for a in aggs] + [
        "",
        "### when aggregation salting pays (the crossover)",
        "",
        "salted_agg_sum LOSES on the sum twin and that is the expected "
        "result, not an anomaly: hash aggregation's map-side partials "
        "already collapse a hot key to ONE row per map task for O(1)-state "
        "aggregates (sum/count/min/max/avg), so the reduce side never sees "
        "the skew — the extra shuffle stage is pure cost. The crossover is "
        "the STATE SIZE of a single group on its one reducer:",
        "",
        "- O(1) state per group (sum, count, avg): never salt — map-side "
        "combine is the mitigation, and it is free;",
        "- O(cardinality) state per group (exact count_distinct, "
        "collect_set/list, exact percentiles): the hot group's distinct "
        "set lands on one reducer; salt by VALUE HASH "
        "(salted_agg_count_distinct) so buckets partition the value space "
        "and counts add — measured above on a hot group whose distinct "
        "count ~= its row count;",
        "- either shape, when one group's state exceeds one executor's "
        "memory (a 100 TB hot key's collect_set): salting is not an "
        "optimization but the only way the stage finishes.",
        "",
        "At 100 TB the naive join's hot reducer is the stage wall-clock: one "
        "task sorts and merges every hot-key row while the other 999 "
        "executors idle. AQE's runtime split is the default answer (and is "
        "ON in the engine session); salted_join is the explicit rewrite for "
        "engines/paths where the optimizer cannot see the skew, and the "
        "value-hash salted count-distinct the equivalent for skewed "
        "O(cardinality) aggregation state. The in-suite correctness twin is "
        "tests/test_scale_patterns.py::test_skew_mitigation_identical_under_planted_skew.",
        "",
    ]
    (REPO / "BENCH_SKEW.md").write_text("\n".join(lines))
    for s in scenarios:
        print(f"{s['label']}: {s['secs']:.2f}s skew_split={s['skew_split']}")
    for a in aggs:
        print(f"{a['label']}: {a['secs']:.2f}s")
    print("wrote BENCH_SKEW.md")
    spark.stop()


if __name__ == "__main__":
    main()
