"""Bloom-filter runtime pre-filtering — the semi-join reduction a 100 TB
decontamination pass runs BEFORE its exact shingle join.

The exact benchmark-overlap join (plans/llm_pipeline.contamination_pairs)
shuffles every corpus shingle posting into a join against the benchmark
postings. At 100 TB the corpus side is the whole crawl — billions of
postings — while the benchmark side is tiny and FIXED. The classic engine
answer (Spark's own ``InjectRuntimeFilter`` does exactly this for suitable
equi-joins) is to compress the small side's join keys into an O(m)-bit
Bloom sketch, materialize the sketch once, and evaluate membership as a
pure map-side expression on the big side, so only true matches plus an
ε-fraction of false positives ever reach the shuffle.

This module builds the sketch *distributedly* (each executor ORs the bit
words of its partition's keys; ``bit_or`` is the map-side-combinable merge,
the same shape as the HLL partition merge in plans/relational.py), then
evaluates the probe entirely in JVM expressions: ``xxhash64(key, seed_i)``
per hash function, one ``element_at`` into an array *literal* of the
sketch's 64-bit words, one bitwise AND per probe. No Python in the data
path, no per-row UDF, no shuffle on the probe side.

Why collecting the sketch to the driver is legitimate (and the only
collect): the sketch is a FIXED-size summary — ``num_bits`` is chosen from
the small side's cardinality, never the corpus's — so the collect moves
O(m/8) bytes (16 KiB at the defaults) regardless of data scale. This is
the same materialization step Spark performs for every broadcast join /
runtime filter; the alternative (a one-row map column via a broadcast
nested-loop join) keeps the plan collect-free but pays an O(words) linear
scan per ``element_at`` on MapData, which loses by ~3 orders of magnitude
on wide sketches.

Guarantees: a Bloom filter has NO false negatives, so
``exact ∘ bloom_probe == exact`` — downstream exact verification restores
set equality and the composition carries a normal value oracle (no
invariant gating needed). False-positive rate is ~(1-e^{-kn/m})^k; the
defaults (k=4, m=2^17) hold ε < 3% up to n ≈ 16k keys — size ``num_bits``
at ≥ 8 bits/key when scaling the benchmark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^17 bits = 2048 longs = 16 KiB sketch
DEFAULT_NUM_BITS = 1 << 17
DEFAULT_NUM_HASHES = 4


def _shl1(nbits: Column) -> Column:
    """``1L << nbits`` with a *column* shift amount — pyspark's
    ``F.shiftleft`` only takes a Python int, but the SQL function accepts
    an expression, so route through call_function."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), nbits)


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of ``key`` — ``pmod(xxhash64(key, i), m)`` for
    seed i in 0..k-1. xxhash64 is a JVM intrinsic (the same family Spark's
    BloomFilterImpl uses), and pmod keeps positions non-negative."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Aggregate the small side's keys into a dense list of ``num_bits/64``
    signed-64-bit words (Python ints, two's-complement in [-2^63, 2^63)).

    Distributed build: each key contributes k (word_idx, single-bit mask)
    rows; ``groupBy(word_idx).agg(bit_or(mask))`` merges them with a
    map-side partial per partition — the executor-local OR is the whole
    trick, the driver only densifies ≤ num_bits/64 rows.
    """
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos")
    bits = keys.select(pos).select(
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        _shl1((F.col("pos") % 64).cast("int")).alias("mask"),
    )
    rows = (
        bits.groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["word_idx"]] = r["word"]
    return words


def bloom_might_contain(
    key: Column,
    words: list[int],
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Pure-expression membership probe: true iff every one of the k bits
    of ``key`` is set in ``words``. ``F.lit(words)`` is a single ArrayType
    literal (not a 2048-ary CreateArray), so codegen indexes it O(1); the
    whole probe is k hash + k element_at + k AND ops per row, map-side."""
    arr = F.lit(words)
    checks = []
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = _shl1((p % 64).cast("int"))
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prefilter(
    big: DataFrame,
    key_col: str,
    small_keys: DataFrame,
    small_key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Filter ``big`` to rows whose ``key_col`` might be in ``small_keys``
    (superset of the true semi-join, no false negatives). Composes as
    ``exact_join(bloom_prefilter(big, ...), small)`` == ``exact_join(big,
    small)`` with the shuffle fed only by survivors."""
    words = bloom_build(small_keys, small_key_col, num_bits, num_hashes)
    return big.where(bloom_might_contain(F.col(key_col), words, num_bits, num_hashes))
