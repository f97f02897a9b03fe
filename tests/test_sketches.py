"""Count-Min sketch contract (operators/sketches.py): no-underestimate
theorem, exact linearity under merge, row-sum build integrity, and the
ε-bound headroom at the test scale factors."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_rohitharumugams_spark.operators.sketches import (
    cms_build,
    cms_eps_bound,
    cms_estimate,
    cms_merge,
)


def _keyed(spark, freqs: dict[str, int]):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_never_underestimates_and_zero_floor(spark):
    freqs = {f"k{i}": 1 + (i * 7) % 13 for i in range(500)}
    df = _keyed(spark, freqs)
    sketch = cms_build(df, "k", depth=4, width=256)  # deliberately tight
    probes = spark.createDataFrame(
        [(k, n) for k, n in freqs.items()] + [("never-seen", 0)],
        "k string, exact int",
    )
    out = cms_estimate(sketch, probes, "k", depth=4, width=256).collect()
    for r in out:
        assert r["est"] >= r["exact"], f"{r['k']}: est {r['est']} < {r['exact']}"
    # absent key floors at >= 0 (may be a false positive, never negative)
    never = [r for r in out if r["k"] == "never-seen"][0]
    assert never["est"] >= 0


def test_merge_is_exactly_linear(spark):
    a = _keyed(spark, {f"a{i}": 3 for i in range(200)})
    b = _keyed(spark, {f"b{i}": 5 for i in range(150)})
    both = a.unionByName(b)
    merged = cms_merge(cms_build(a, "k"), cms_build(b, "k"))
    direct = cms_build(both, "k")
    diff = (
        merged.withColumnRenamed("cnt", "m")
        .join(direct.withColumnRenamed("cnt", "d"), ["seed", "bucket"], "full")
        .where(~F.coalesce(F.col("m"), F.lit(0)).eqNullSafe(F.coalesce(F.col("d"), F.lit(0))))
        .count()
    )
    assert diff == 0


def test_rowsums_equal_input_size(spark):
    df = _keyed(spark, {f"x{i}": 2 for i in range(300)})
    sums = cms_build(df, "k", depth=4).groupBy("seed").agg(F.sum("cnt").alias("s"))
    rows = sums.collect()
    assert len(rows) == 4 and all(r["s"] == 600 for r in rows)


def test_eps_bound_headroom_on_orders(spark, sf_dir):
    """The registered query's cms_within_eps bound must hold with real
    headroom (>=2x) at the driver's scale factor, not just barely."""
    from custom_python_etl_data_connector_rohitharumugams_spark.catalog import load_table
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    n = orders.count()
    sketch = cms_build(orders, "o_custkey")
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact"))
    top = counts.orderBy(F.desc("exact"), F.asc("o_custkey")).limit(20)
    out = cms_estimate(sketch, top, "o_custkey").collect()
    bound = cms_eps_bound(n)
    worst = max(r["est"] - r["exact"] for r in out)
    assert worst * 2 <= bound, f"worst excess {worst} vs bound {bound}"


def test_stream_cms_maintenance_invariants_at_smoke_sf(spark):
    """All four gate booleans must be 1 at the smoke scale factor too
    (the driver checks sf0.01; this pins sf0.001 where slices are tiny
    and an off-by-one in batch accounting would surface first)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    rows = all_queries()["stream_cms_maintenance"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["cms_ge_exact"] == 1
        assert r["cms_within_eps"] == 1
        assert r["streamed_equals_batch"] == 1
        assert r["multi_batch"] == 1


def test_histogram_quantiles_match_sorted_reference(spark):
    """The CDF-walk quantile equals the rank-based reference ("smallest
    value whose cumulative count reaches ceil(q*n)") on a small list with
    heavy ties — the definition both engines implement in the registered
    query's integer-arithmetic form."""
    import math

    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries  # noqa: F401 — registry import path sanity

    vals = [100, 100, 100, 200, 300, 300, 400, 500, 500, 500, 500, 900]
    df = spark.createDataFrame([("A", v) for v in vals], "flag string, v long")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hist = df.groupBy("flag", "v").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.select(
        "flag", "v",
        F.sum("c").over(Window.partitionBy("flag").orderBy("v")).alias("cm"),
        F.sum("c").over(Window.partitionBy("flag")).alias("n"),
    )
    got = cum.groupBy("flag").agg(
        F.min(F.when(F.col("cm") * 2 >= F.col("n"), F.col("v"))).alias("p50"),
        F.min(F.when(F.col("cm") * 10 >= 9 * F.col("n"), F.col("v"))).alias("p90"),
    ).collect()[0]
    s = sorted(vals)
    ref = lambda q: s[math.ceil(q * len(s)) - 1]  # noqa: E731
    assert (got["p50"], got["p90"]) == (ref(0.5), ref(0.9))
