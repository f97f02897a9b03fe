"""Bloom runtime-filter contract (operators/bloom.py): no false negatives
ever, a real map-side discard rate at fixture scale, and composition
equality with the exact decontamination join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_rohitharumugams_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def test_no_false_negatives_and_low_fp(spark):
    small = spark.range(200).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    big = spark.range(20_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    surv = {r["k"] for r in bloom_prefilter(big, "k", small, "k").collect()}
    true = {f"k{i}" for i in range(200)}
    assert true <= surv, "bloom filter produced false negatives"
    # 200 keys in 2^17 bits, k=4: FP rate is well under 1% — allow 1%
    assert len(surv) - 200 <= 0.01 * 19_800


def test_probe_is_pure_expression_no_extra_exchange(spark):
    """The probe must not add a shuffle or a Python stage: the survivors
    plan contains exactly the scans/exchanges of the unfiltered plan."""
    small = spark.range(50).select(F.concat(F.lit("s"), F.col("id")).alias("k"))
    big = spark.range(5_000).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    words = bloom_build(small, "k")
    plan = (
        big.where(bloom_might_contain(F.col("k"), words))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF in the probe path


def test_build_words_match_single_node_reference(spark):
    """The distributed bit_or build equals a sequential reference bloom
    constructed from the same hash positions."""
    keys = [f"key-{i}" for i in range(97)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    num_bits, k_hashes = 1 << 12, 4
    words = bloom_build(df, "k", num_bits, k_hashes)
    # reference: reuse Spark only to get xxhash64 values (the hash is a
    # JVM intrinsic), then set bits sequentially in Python
    pos_rows = df.select(
        *[
            F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(num_bits)).alias(f"p{i}")
            for i in range(k_hashes)
        ]
    ).collect()
    ref = [0] * (num_bits // 64)
    for row in pos_rows:
        for i in range(k_hashes):
            p = row[f"p{i}"]
            ref[p // 64] |= 1 << (p % 64)
    # two's-complement normalize: Spark longs are signed
    ref = [w - (1 << 64) if w >= (1 << 63) else w for w in ref]
    assert words == ref


def test_num_bits_must_be_word_aligned(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        bloom_build(df, "k", num_bits=100)


def test_bloom_overlap_equals_exact_overlap(spark):
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    qs = all_queries()
    got = sorted(
        map(tuple, qs["llm_bloom_benchmark_overlap"].fn(spark, SMOKE_SF_DIR).collect())
    )
    want = sorted(
        map(tuple, qs["llm_benchmark_overlap"].fn(spark, SMOKE_SF_DIR).collect())
    )
    assert got == want and len(want) > 0


def test_prefilter_discards_most_corpus_postings(spark):
    """The scale claim, measured: at sf0.001 the benchmark's shingle
    vocabulary is a sliver of the corpus's, so the probe must discard the
    large majority of corpus postings before any join."""
    from custom_python_etl_data_connector_rohitharumugams_spark.catalog import load_table
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.dedup import (
        shingle_postings,
    )
    from custom_python_etl_data_connector_rohitharumugams_spark.plans.llm_pipeline import (
        BENCH_MODULUS,
    )

    posts = shingle_postings(load_table(spark, SMOKE_SF_DIR, "documents"), shingle_n=3)
    bench = (
        posts.where(F.col("doc_id") % BENCH_MODULUS == 0).select("shingle").distinct()
    )
    corpus = posts.where(F.col("doc_id") % BENCH_MODULUS != 0)
    total = corpus.count()
    kept = bloom_prefilter(corpus, "shingle", bench, "shingle").count()
    assert kept < 0.2 * total, f"probe kept {kept}/{total} corpus postings"


def test_saturated_filter_degrades_to_passthrough_never_drops(spark):
    """Undersizing the sketch (n >> m/8) saturates the bit array; the
    correct degradation is pass-through (everything survives, the exact
    join still fixes it) — NEVER a dropped true match. This pins the
    failure mode a mis-sized benchmark sketch would hit at crawl scale."""
    small = spark.range(5_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    big = spark.range(6_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    surv = {
        r["k"]
        for r in bloom_prefilter(big, "k", small, "k", num_bits=4096).collect()
    }
    true = {f"k{i}" for i in range(5_000)}
    assert true <= surv, "saturation must never produce false negatives"
