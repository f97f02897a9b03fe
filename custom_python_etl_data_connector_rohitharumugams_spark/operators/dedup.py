"""Deduplication operator family (SURVEY.md L1/L2, BASELINE.json north star):
exact, MinHash+LSH banded, and SimHash near-dup — each built from built-in
DataFrame ops so the candidate-generation stage is a plain shuffle join.

Scale design (the part that matters at 100 TB):
- exact dedup is a hash aggregate on a content digest — one shuffle;
- shingling is ROW-form (posexplode + window lead), never array
  higher-order functions: windowed lead is whole-stage-codegen'd, while
  per-array lambda interpretation costs ~10x at corpus scale;
- MinHash/LSH never compares all pairs: each doc explodes into B band rows,
  candidates are an equi-join on (band, band_hash) — cost tracks colliding
  pairs, not n^2;
- verification (exact Jaccard) is a posting-list join over candidate docs
  only — pair cost proportional to true overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens



def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (smallest id) per distinct text digest. NULL-text rows
    are each their own identity (sha2(NULL) is NULL for every one of them —
    partitioning on it directly would silently collapse ALL null-text docs
    into a single survivor), so they all pass through."""
    h = F.coalesce(
        F.sha2(F.col(text_col), 256),
        F.concat(F.lit("__null__"), F.col(id_col).cast("string")),
    ).alias("__digest")
    return (
        df.withColumn("__digest", h)
        .withColumn(
            "__rn", F.row_number().over(Window.partitionBy("__digest").orderBy(id_col))
        )
        .where(F.col("__rn") == 1)
        .drop("__digest", "__rn")
    )


def shingle_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Distinct (doc_id, shingle) postings via posexplode + window lead —
    one shuffle (by doc), fully codegen'd, no array lambdas."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, shingle_n)]
    sh = toks.select(
        "doc_id",
        F.when(
            parts[-1].isNotNull(), F.concat_ws(" ", *parts)
        ).alias("shingle"),
    ).where(F.col("shingle").isNotNull())
    return sh.dropDuplicates(["doc_id", "shingle"])


def df_capped_postings(
    postings: DataFrame,
    max_df_num: int = 1,
    max_df_den: int = 10,
    n_docs: DataFrame | None = None,
) -> DataFrame:
    """Drop hot shingles: postings whose shingle appears in more than
    ``max_df_num/max_df_den`` of all posted documents are removed.

    This is the stop-shingle cap that keeps an inverted-index join from
    degenerating: a boilerplate shingle present in every document otherwise
    connects all docs pairwise and the candidate join emits n^2 rows. With
    the cap, any single shingle contributes at most (n * num/den)^2 / 2
    pairs. The comparison is pure integer arithmetic (df * den <= n * num)
    so an oracle in another engine reproduces the cutoff bit-exactly; the
    corpus size is a 1-row broadcast, not a driver-side count.

    The document frequency comes from a window count over shingle — ONE
    pass over postings (shingling is an explode + window pipeline; a
    groupBy + semi-join formulation would re-evaluate that whole subtree
    two more times). Pass ``n_docs`` (any 1-row frame whose first column is
    the corpus size — e.g. ``docs.agg(count(*))``, a parquet metadata-only
    count) to keep the denominator off the postings subtree too; without it
    the denominator is the count of posted docs, derived from postings."""
    if n_docs is None:
        n_docs = postings.agg(F.count_distinct("doc_id").alias("__n"))
    else:
        n_docs = n_docs.select(F.col(n_docs.columns[0]).alias("__n"))
    w = Window.partitionBy("shingle")
    return (
        postings.withColumn("__df", F.count(F.lit(1)).over(w))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") * max_df_den <= F.col("__n") * max_df_num)
        .drop("__df", "__n")
    )


def minhash_signatures(
    postings: DataFrame,
    num_perm: int = 32,
) -> DataFrame:
    """Per-doc MinHash signature (array<bigint> length ``num_perm``) from a
    shingle-postings frame.

    Each slot i is ``min over shingles of xxhash64(i, shingle)`` — the
    slot index is an extra hash INPUT, so the ``num_perm`` functions are
    genuinely independent draws. The textbook affine family
    ``(a*h + b) mod p`` is NOT usable here without 128-bit arithmetic:
    keeping ``a*h`` under the int64 ANSI-overflow ceiling forces
    ``a*h + b < p``, the mod never wraps, every "permutation" becomes
    order-preserving in ``h`` — and then ALL slots are minimized by the
    same shingle, collapsing the signature to a bijection of one value
    (band collision probability degenerates from 1-(1-J^r)^b to exactly
    J; this module shipped that way through round 6 and the planted-dup
    oracles never noticed because identical docs still collide). The
    shingle STRING is hashed once; each slot re-hashes the resulting
    64-bit value with its index (fixed 16 input bytes per slot instead of
    re-hashing the string ``num_perm`` times). All slots still compute
    inside ONE partial-aggregating groupBy.
    """
    hashed = postings.select("doc_id", F.xxhash64("shingle").alias("__h"))
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"m{i}")
            for i in range(num_perm)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("signature")
    )


def band_rows(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Explode MinHash signatures into LSH band rows ``(doc_id, band,
    band_hash)`` — the join-ready form of the banding trick, shared by the
    all-pairs candidate join (:func:`lsh_candidate_pairs`) and the
    streaming near-dup INDEX (stream_corpus_admission persists exactly
    these rows, so the incremental band join needs no signature re-band
    per micro-batch).

    Signatures shorter than ``bands * rows_per_band`` fail loudly per-row:
    under ANSI the out-of-range element_at would error anyway, but with
    ANSI off it returns NULL and concat_ws silently skips it — truncated
    band hashes and a systematically wrong candidate set."""
    needed = bands * rows_per_band
    sigs = sigs.where(
        F.when(F.size("signature") >= needed, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"band_rows: bands*rows_per_band={needed} "
                        "exceeds signature length "
                    ),
                    F.size("signature").cast("string"),
                )
            )
        )
    )
    return sigs.select(
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


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and equi-join on (band, band_hash): docs agreeing
    on ALL rows of any band become candidate pairs (doc1 < doc2)."""
    banded = band_rows(sigs, bands=bands, rows_per_band=rows_per_band)
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


def jaccard_verify(
    pairs: DataFrame, postings: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard on candidate pairs via posting-list join (set
    semantics): |inter| counted by joining each pair's postings on the
    shingle, |union| = n1 + n2 - |inter|. Candidate pairs are few, so the
    pair frame broadcasts and the postings never reshuffle per pair.

    Set sizes ride along as a window count over doc_id and come out of the
    intersection aggregate via first() — a separate sizes aggregate plus
    two re-joins would re-evaluate the whole shingle pipeline (explode +
    window + dedup) two more times; this shape evaluates postings exactly
    twice (the unavoidable two sides of the intersection join)."""
    w = Window.partitionBy("doc_id")
    p = postings.withColumn("__n", F.count(F.lit(1)).over(w))
    p1 = p.select(F.col("doc_id").alias("doc_id_1"), "shingle", F.col("__n").alias("n1"))
    p2 = p.select(F.col("doc_id").alias("doc_id_2"), "shingle", F.col("__n").alias("n2"))
    # explicit hint: "pairs are few" is the operator's contract, but above
    # the auto-broadcast threshold Spark would otherwise shuffle the full
    # postings relation twice — the exact cost this shape exists to avoid
    pairs = F.broadcast(pairs)
    return (
        pairs.join(p1, "doc_id_1")
        .join(p2, ["doc_id_2", "shingle"])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
        .select(
            "doc_id_1",
            "doc_id_2",
            F.round(
                F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: per-bit vote over xxhash64(token) values,
    computed as 64 conditional aggregates after an explode (single shuffle).
    """
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
    # materialize the hash ONCE per token: referencing xxhash64(tok) inside
    # each of the 64 vote aggregates would re-evaluate it 64x per row
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    h = F.col("h")
    votes = hashed.groupBy("doc_id").agg(
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


def simhash_banded_pairs(
    sh: DataFrame, bands: int = 4, max_hamming: int = 3, max_bucket: int | None = None
) -> DataFrame:
    """Full-corpus SimHash near-dup pairs — no caller-provided blocking.

    The 63 materialized simhash bits split into ``bands`` equal segments;
    candidate pairs are an equi-join on (band, segment) — the same
    bucket-join shape as MinHash-LSH, so comparisons track segment
    collisions, never n^2. Pigeonhole guarantee: two hashes within
    ``max_hamming`` differing bits agree exactly on >=1 whole band whenever
    ``max_hamming < bands``, so in that regime (the near-dup regime) recall
    is exact; beyond it banding is approximate. Fewer bands = wider
    segments = sharper buckets (15-bit segments collide ~10x less than
    9-bit on the fixture corpus), so use the smallest ``bands`` that is
    still > ``max_hamming``.

    Unlike vectors, a simhash is ONE long — carrying it through the bucket
    join costs 8 bytes/row, so the join emits (id, hash) pairs directly and
    nothing is re-joined; the Hamming filter runs BEFORE the pair dedup,
    shrinking the dropDuplicates input from all bucket collisions to actual
    near-dups. The upstream simhash aggregation is evaluated once per join
    side instead of three times.

    ``max_bucket`` is the 100 TB degenerate-bucket guard (same stance as
    MinHash hot bands, DESIGN.md): a segment value shared by more docs than
    this cannot discriminate, and its bucket alone would contribute
    O(bucket^2) candidates. Capped buckets are dropped entirely — recall
    inside the pigeonhole radius is then no longer exact, which is the
    documented trade; None (default) keeps exactness.
    """
    bits_per = 63 // bands
    mask = (1 << bits_per) - 1
    segs = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * bits_per).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "segment"),
    )
    if max_bucket is not None:
        cold = (
            segs.groupBy("band", "segment")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_bucket)
            .select("band", "segment")
        )
        segs = segs.join(cold, ["band", "segment"], "semi")
    a = segs.select(
        F.col("doc_id").alias("doc_id_1"), F.col("simhash").alias("sh_1"), "band", "segment"
    )
    b = segs.select(
        F.col("doc_id").alias("doc_id_2"), F.col("simhash").alias("sh_2"), "band", "segment"
    )
    return (
        a.join(b, ["band", "segment"])
        .where(F.col("doc_id_1") < F.col("doc_id_2"))
        .select(
            "doc_id_1",
            "doc_id_2",
            F.bit_count(F.col("sh_1").bitwiseXOR(F.col("sh_2"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_id_1", "doc_id_2"])
    )


def simhash_near_pairs(
    sh: DataFrame, blocking: DataFrame, max_hamming: int = 28
) -> DataFrame:
    """Hamming-close pairs among docs sharing a blocking key (bounded
    comparison set; ``simhash_banded_pairs`` is the full-corpus variant).
    Deduplicated like the banded variant: a pair sharing SEVERAL blocking
    keys must still appear once, or pair-level aggregates double-count."""
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
        .dropDuplicates(["doc_id_1", "doc_id_2"])
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every token ``k``-gram, then keep the MINIMUM hash of
    each sliding ``window`` of consecutive gram hashes; the distinct
    selected values are the document's fingerprint set. Output:
    ``(doc_id, fp)`` postings.

    Why this mechanism earns its slot next to MinHash/SimHash: selection
    is LOCAL — which hash a window selects depends only on that window's
    ``k + window - 1`` tokens — which buys the famous guarantee that
    NO sketch gives: any shared token run of at least ``k + window - 1``
    tokens contributes at least one IDENTICAL fingerprint to both
    documents, regardless of where the run sits in either document
    (MinHash only matches with probability ~ Jaccard; winnowing matches
    with certainty). Corollary used by the oracle: a document of at
    least ``k + window - 1`` tokens embedded verbatim inside another
    (prefix/suffix/middle insertion) has its ENTIRE fingerprint set
    contained in the host's. The length floor is load-bearing: a doc of
    ``k .. k + window - 2`` tokens has fewer grams than the window, so
    its single partial-window fingerprint is the min over FEWER hashes
    than any full host window considers — a value the host's windows
    need not select — and containment is not guaranteed for it.

    Deviation from the paper, stated: ties inside a window select by
    VALUE (array_min), not the paper's rightmost-position rule — the
    rule only affects fingerprint DENSITY under repeated equal hashes,
    never the containment guarantee, and value-min keeps the whole
    pipeline inside codegen'd expressions. Documents with fewer
    than ``k`` tokens have no k-grams and emit NO fingerprints (they
    can never match; pair them with exact_dedup, which has no length
    floor).

    Scale shape: ROW form throughout, per this module's house rule —
    posexplode + lead() builds the gram hashes and a FRAMED window min
    (ROWS BETWEEN CURRENT AND window-1 FOLLOWING) selects each window's
    minimum, all whole-stage-codegen'd, one doc-keyed shuffle. The
    first cut used array higher-order functions (transform + slice +
    array_min per window) and Catalyst re-evaluated the inner gram
    transform PER WINDOW ELEMENT — O(tokens^2) interpreted lambda work
    per row, measured as a 200+ s bench row at sf0.1 vs ~2 s for this
    form; the module docstring's "never array HOFs for shingling"
    warning exists for exactly this trap. The one data-sized movement
    after construction is the downstream equi-join on fp; winnowing
    SELECTS FOR corpus-hot values by design (a boilerplate run shared
    by every doc fingerprints identically in all of them — that is the
    guarantee), so cap postings with df_capped_postings before any
    pair join, same as the MinHash pipeline.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w_lead = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w_lead) for j in range(1, k)]
    grams = toks.select(
        "doc_id",
        "pos",
        F.when(
            parts[-1].isNotNull(), F.xxhash64(F.concat_ws(" ", *parts))
        ).alias("gh"),
    ).where(F.col("gh").isNotNull())
    w_doc = Window.partitionBy("doc_id")
    w_min = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    )
    return (
        grams.withColumn("__maxp", F.max("pos").over(w_doc))
        .withColumn("__wm", F.min("gh").over(w_min))
        # windows fully inside the gram sequence; a doc with fewer grams
        # than `window` keeps its first (partial) window so it still
        # fingerprints — same semantics as a single min over all grams
        .where(
            F.col("pos")
            <= F.greatest(F.lit(0), F.col("__maxp") - F.lit(window - 1))
        )
        # per-doc dedup as collect_set + explode, NOT dropDuplicates:
        # the rows leave the window stage hash-partitioned by doc_id, a
        # distribution this groupBy reuses, while dropDuplicates would
        # re-shuffle on (doc_id, fp). Per-doc set size is bounded by the
        # doc's gram count (winnowing density ~2/(window+1) of grams) —
        # the same per-doc envelope minhash_signatures' groupBy carries.
        .groupBy("doc_id")
        .agg(F.collect_set("__wm").alias("__fps"))
        .select("doc_id", F.explode("__fps").alias("fp"))
    )


def winnow_overlap_pairs(
    postings: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """Near-dup pairs from winnowing postings by OVERLAP COEFFICIENT:
    ``|fp(A) ∩ fp(B)| * den >= num * min(|fp(A)|, |fp(B)|)`` — integer
    arithmetic end to end, so the cutoff is engine-exact. Overlap (not
    Jaccard) is the right verifier for fingerprint CONTAINMENT: a short
    document pasted into a long one shares all its fingerprints but few
    of the host's, so Jaccard dilutes with host length while overlap
    stays 1. Candidates come from the fp equi-join (never all pairs);
    cap hot fingerprints first with df_capped_postings(postings renamed
    fp->shingle) when the corpus carries boilerplate.

    Plan shape: per-doc sizes ride WITH the postings as a window count
    (one doc_id exchange over the postings subtree, evaluated once) and
    travel through the fp equi-join into the pair groupBy's key set —
    the earlier groupBy-sizes + two joins formulation re-planned the
    whole postings subtree three times and cost 9 extra plan legs
    (21 -> 10 exchanges on llm_winnowing_near_dup). The two join sides
    differ only in aliases, so ReuseExchange computes their fp shuffle
    once; n_fp_1/n_fp_2 are constant per (doc_id_1, doc_id_2), so
    widening the groupBy key adds no cardinality."""
    if "n_fp" not in postings.columns:
        postings = postings.withColumn(
            "n_fp", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    a = postings.select(
        F.col("doc_id").alias("doc_id_1"), "fp", F.col("n_fp").alias("n_fp_1")
    )
    b = postings.select(
        F.col("doc_id").alias("doc_id_2"), "fp", F.col("n_fp").alias("n_fp_2")
    )
    return (
        a.join(b, "fp")
        .where(F.col("doc_id_1") < F.col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2", "n_fp_1", "n_fp_2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .where(
            F.col("n_inter") * threshold_den
            >= F.lit(threshold_num) * F.least("n_fp_1", "n_fp_2")
        )
        .select("doc_id_1", "doc_id_2", "n_inter")
    )


def duplicated_gram_positions(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT-SUBSTRING dedup positions (Lee, Ippolito et al. — *Deduplicating
    Training Data Makes Language Models Better*, ACL 2022 — the ExactSubstr
    pass, re-expressed relationally): every corpus-wide repetition of a
    ``k``-token run, EXCEPT its first occurrence, marks its covered token
    positions for removal. Returns distinct ``(doc_id, pos)`` rows — the
    tokens a single-pass substring-dedup rewrite would cut.

    Semantics, stated precisely (all integer, so an oracle reproduces the
    cutoff bit-exactly):
    - tokens are whitespace-split with empties dropped; a doc with fewer
      than ``k`` tokens emits no grams and is never cut;
    - the FIRST occurrence of a gram value is the lexicographically
      smallest (doc_id, pos) over the whole corpus — global, not
      source-blocked: boilerplate repeated across sources is exactly what
      substring dedup exists to cut;
    - every other occurrence marks positions [pos, pos+k-1]; overlapping
      marked ranges merge through the final DISTINCT;
    - single pass (no cascade): removals do not create new adjacencies to
      re-examine — the paper's semantics, and what keeps the operator one
      deterministic plan.

    Scale shape — the suffix-array stage of the paper replaced by
    relational primitives: gram construction is the house-rule ROW form
    (posexplode + lead, whole-stage codegen'd, one doc-keyed shuffle);
    first-occurrence selection is a partial-aggregating ``groupBy(gram).
    agg(min(struct(doc_id, pos)))`` — map-side combine collapses hot
    boilerplate grams BEFORE the shuffle, so the gram exchange tracks
    DISTINCT grams, not occurrences, and no per-gram sort or window ever
    materializes a hot gram's full occurrence list on one task; the
    occurrences-vs-first equi-join on gram is row-matched (linear in
    occurrences, never quadratic — unlike pair-join dedup, repetition
    MASS is the output here, so occurrence cardinality is irreducible);
    the k-fold position explode is bounded by k * |duplicate grams|."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    grams = toks.select(
        "doc_id",
        "pos",
        F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts)).alias("gram"),
    ).where(F.col("gram").isNotNull())
    firsts = grams.groupBy("gram").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    dup_occurrences = grams.join(firsts, "gram").where(
        (F.col("doc_id") != F.col("first.doc_id"))
        | (F.col("pos") != F.col("first.pos"))
    )
    return (
        dup_occurrences.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__i"),
            "pos",
        )
        .select("doc_id", (F.col("pos") + F.col("__i")).alias("pos"))
        .distinct()
    )
