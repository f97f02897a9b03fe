"""Deduplication operator family (SURVEY.md L1/L2, BASELINE.json north star):
exact, MinHash+LSH banded, and SimHash near-dup — each built from built-in
DataFrame ops so the candidate-generation stage is a plain shuffle join.

Scale design (the part that matters at 100 TB):
- exact dedup is a hash aggregate on a content digest — one shuffle;
- MinHash/LSH never compares all pairs: each doc explodes into B band rows,
  candidates are an equi-join on (band, band_hash) — cost is proportional to
  the number of colliding pairs, not n^2;
- verification (exact Jaccard / hamming) runs only on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens

MERSENNE_P = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (smallest id) per distinct text digest."""
    h = F.sha2(F.col(text_col), 256).alias("__digest")
    return (
        df.withColumn("__digest", h)
        .withColumn(
            "__rn", F.row_number().over(Window.partitionBy("__digest").orderBy(id_col))
        )
        .where(F.col("__rn") == 1)
        .drop("__digest", "__rn")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: array<bigint> of length ``num_perm``.

    Permutation i is the affine family h_i(x) = (a_i*x + b_i) mod p over the
    64-bit shingle hash (xxhash64). Deterministic coefficients; JVM wrapping
    multiplication is fine for hashing (no oracle claims exactness here).
    """
    coeffs = [(2 * i + 1, 104729 * (i + 1) % MERSENNE_P) for i in range(num_perm)]
    sh = F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))
    shingled = df.select(F.col(id_col).alias("doc_id"), sh.alias("shingle_set"))

    # Explode-then-aggregate, NOT per-permutation array transforms: each
    # shingle is hashed exactly once, and every permutation is two integer
    # ops per shingle inside one hash aggregate (map-side partial mins).
    # The inline-expression variant re-evaluated tokenize+shingle+hash once
    # per permutation — 32x the work and off codegen.
    exploded = shingled.select("doc_id", F.explode("shingle_set").alias("shingle"))
    # fold the 64-bit hash to 32 bits: ANSI mode (Spark 4 default) raises on
    # int64 overflow, so a*x must stay below 2^63
    h32 = F.pmod(F.xxhash64("shingle"), F.lit(1 << 32))
    mins = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(a * h32 + b, F.lit(MERSENNE_P))).alias(f"m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    sig = mins.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("signature")
    )
    return shingled.join(sig, "doc_id").select("doc_id", "shingle_set", "signature")


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and equi-join on (band, band_hash): docs agreeing
    on ALL rows of any band become candidate pairs (doc1 < doc2)."""
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws(",", *[
                        F.element_at("signature", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_id_1"), F.col("r.doc_id").alias("doc_id_2"))
        .dropDuplicates()
    )


def jaccard_verify(pairs: DataFrame, sigs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard on candidate pairs' shingle sets (set semantics)."""
    s1 = sigs.select(F.col("doc_id").alias("doc_id_1"), F.col("shingle_set").alias("set_1"))
    s2 = sigs.select(F.col("doc_id").alias("doc_id_2"), F.col("shingle_set").alias("set_2"))
    inter = F.size(F.array_intersect("set_1", "set_2")).cast("double")
    union = F.size(F.array_union("set_1", "set_2")).cast("double")
    return (
        pairs.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: per-bit vote over xxhash64(token) values,
    computed as 64 conditional aggregates after an explode (single shuffle).
    """
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = F.xxhash64("tok")
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    bits = [
        F.when(F.col(f"b{j}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        * F.lit(1 << j).cast("bigint")
        for j in range(63)  # bit 63 excluded: keep the hash non-negative
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return votes.select("doc_id", acc.alias("simhash"))


def simhash_near_pairs(
    sh: DataFrame, blocking: DataFrame, max_hamming: int = 28
) -> DataFrame:
    """Hamming-close pairs among docs sharing a blocking key (bounded
    comparison set; full-corpus variant would band the simhash bits)."""
    a = sh.join(blocking, "doc_id").select(
        F.col("doc_id").alias("doc_id_1"), F.col("simhash").alias("sh_1"), "block"
    )
    b = sh.join(blocking, "doc_id").select(
        F.col("doc_id").alias("doc_id_2"), F.col("simhash").alias("sh_2"), "block"
    )
    return (
        a.join(b, (a.block == b.block) & (F.col("doc_id_1") < F.col("doc_id_2")))
        .select(
            "doc_id_1",
            "doc_id_2",
            F.bit_count(F.col("sh_1").bitwiseXOR(F.col("sh_2"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
