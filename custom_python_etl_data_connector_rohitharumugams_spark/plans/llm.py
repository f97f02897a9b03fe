"""LLM-data-pipeline queries (SURVEY.md SS2.10, L1-L5): dedup families,
similarity search, text analysis, multimodal column convention.

Oracle notes: Jaccard/text/fingerprint/cosine queries are fully
SQL-expressible with DuckDB list functions. MinHash/SimHash/LSH depend on
xxhash64 (engine-specific), so their named queries take INVARIANT form: the
sketch pipeline runs end to end, but the emitted row is an
oracle-reproducible ground truth plus a recall boolean the oracle states a
priori (planted-duplicate recall for the near-dup sketches, exact-top-k
recall for ANN) — a hash mismatch means the sketch stopped finding what it
must. Raw pair/top-k outputs remain available via operators.dedup /
operators.similarity; additional recall checks live in tests/test_llm_ops.py.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import multimodal as M
from ..functions import text as T
from ..operators import bpe as B
from ..operators import dedup as D
from ..operators import similarity as S
from .registry import query

# --------------------------------------------------------------------------
# L1 exact dedup + L4 text analysis (oracle-checked)
# --------------------------------------------------------------------------


@query(
    "llm_exact_dedup_documents",
    tags=("L1", "O5", "F8"),
    oracle="""
    SELECT digest, MIN(doc_id) AS keeper_id, COUNT(*) AS copies
    FROM (SELECT doc_id, md5(text) AS digest FROM documents)
    GROUP BY digest
    """,
)
def llm_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: one digest per distinct text, keeper = min id.
    (Single hash-aggregate shuffle — the 100 TB exact-dedup plan.)"""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("copies"))
    )


@query(
    "llm_token_stats_by_lang",
    tags=("L4", "A1", "F5"),
    oracle="""
    SELECT lang,
           COUNT(*) AS doc_cnt,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT)                      AS total_chars,
           MAX(len(string_split(text, ' ')))                 AS max_tokens,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def llm_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting aggregated per language."""
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(T.tokens(F.col("text")))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.sum(ntok).cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max(ntok).alias("max_tokens"),
        F.round(F.avg(ntok.cast("double")), 4).alias("avg_tokens"),
    )


@query(
    "llm_quality_scores",
    tags=("L4", "F5"),
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                       AS n_tokens,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4)           AS distinct_ratio,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(string_split(text, ' '),
                                  t -> CAST(length(t) AS DOUBLE))),
                   (a, b) -> a + b) / len(string_split(text, ' ')), 4) AS avg_token_len,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('table', 'row', 'value', 'query', 'join', 'scan')))
                 AS DOUBLE) / len(string_split(text, ' ')), 4) AS marker_ratio
    FROM documents
    """,
)
def llm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, vocabulary diversity,
    mean token length, marker-word ratio (language-ID heuristic input)."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(T.distinct_ratio(toks), 4).alias("distinct_ratio"),
        F.round(T.avg_token_len(toks), 4).alias("avg_token_len"),
        F.round(T.marker_ratio(toks), 4).alias("marker_ratio"),
    )


@query(
    "llm_lang_marker_profile",
    tags=("L4", "A1"),
    oracle="""
    SELECT lang, source,
           COUNT(*) AS doc_cnt,
           ROUND(AVG(CAST(len(list_filter(string_split(text, ' '),
                 t -> t IN ('table', 'row', 'value', 'query', 'join', 'scan')))
                 AS DOUBLE) / len(string_split(text, ' '))), 4) AS avg_marker_ratio
    FROM documents
    GROUP BY lang, source
    """,
)
def llm_lang_marker_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic profile: marker-word density by (lang, source)."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.round(F.avg(T.marker_ratio(toks)), 4).alias("avg_marker_ratio"),
    )


@query(
    "llm_langid_ngram",
    tags=("L4", "F1", "A1", "W4"),
    oracle="""
    WITH ok AS (
        SELECT doc_id, lang FROM documents
        WHERE text IS NOT NULL
          AND length(regexp_replace(lower(text), '[^a-z]', '', 'g')) >= 3
    )
    SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN doc_id ELSE 0 END) AS BIGINT)
               AS test_checksum,
           TRUE AS all_correct
    FROM ok
    """,
)
def llm_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-ID, trained and evaluated end-to-end
    (operators/langid.py — the CLASSIFIER the marker-ratio profiles feed).

    The synthetic fixture's five language labels share ONE vocabulary, so
    a classifier trained on the raw text could only measure chance. The
    query therefore follows this repo's planted-invariant discipline
    (llm_semantic_dedup, the MinHash recall queries): each document's a-z
    text is TRANSLITERATED into a disjoint 26-code-point block per label
    (langid.lang_blocks) — the script-disjoint case real language ID
    solves structurally (Latin vs Greek vs Cyrillic ...) — then trigram
    profiles are trained on the doc_id % 5 != 0 split and the held-out
    docs classified by broadcast profile overlap + per-doc argmax.

    Why the oracle is a priori: scripts are disjoint, so a held-out doc's
    trigrams can match NO other language's profile — cross-language score
    is structurally zero and the argmax cannot pick a wrong label; the
    only conceivable miss is a test doc sharing zero trigrams with its
    own language's training split, impossible here because every doc
    draws on the fixture's one small word list (any shared word is >= 1
    shared trigram). So held-out accuracy == 1 is stated a priori, and
    n_langs / n_test / test_checksum pin the evaluation frame exactly.

    Bounded collect: the distinct label set (5 rows) is collected to
    build the transliteration map — same driver-bounded discipline as
    kmeans centroids. Scale shape: training is one vocabulary-bounded
    distinct-aggregate (top_k caps it on a real corpus), prediction is a
    broadcast join + per-doc W4 argmax — see operators/langid.py."""
    from ..operators import langid as L

    d = load_table(spark, sf_dir, "documents")
    ok = d.where(
        F.col("text").isNotNull()
        & (F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")) >= 3)
    )
    langs = sorted(r[0] for r in ok.select("lang").distinct().collect())
    # persisted, not unpersisted: the final agg's plan consumes the
    # transliterated frame three times (profile build + predict + grade);
    # the cached block is two small columns + the stripped script string,
    # deduped by logical plan across bench reruns — same session-artifact
    # discipline as _EXACT_TRUTH
    scripted = ok.select(
        "doc_id",
        "lang",
        L.transliterate(F.col("text"), F.col("lang"), L.lang_blocks(langs)).alias(
            "__script"
        ),
    ).persist()
    train = scripted.where(F.col("doc_id") % 5 != 0)
    test = scripted.where(F.col("doc_id") % 5 == 0)
    preds = L.predict(test, L.train_profiles(train))
    graded = test.join(preds, "doc_id", "left")
    return graded.agg(
        F.lit(len(langs)).cast("bigint").alias("n_langs"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("doc_id").cast("bigint").alias("test_checksum"),
        (
            F.sum((F.col("pred_lang") == F.col("lang")).cast("long"))
            == F.count(F.lit(1))
        ).alias("all_correct"),
    )


@query(
    "llm_bpe_token_counts",
    tags=("L4", "F1"),
    oracle="""
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text,
                '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r])'))) AS BIGINT) AS bpe_tokens,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)       AS ws_tokens,
           COUNT(*) AS doc_cnt
    FROM documents
    GROUP BY source
    """,
)
def llm_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting vs whitespace counting, per source."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.size(T.bpe_ish_tokens(F.col("text")))).cast("bigint").alias("bpe_tokens"),
        F.sum(F.size(T.tokens(F.col("text")))).cast("bigint").alias("ws_tokens"),
        F.count(F.lit(1)).alias("doc_cnt"),
    )


@query(
    "llm_bpe_train",
    tags=("L4", "A1", "W3"),
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
        SELECT word, COUNT(*) AS cnt FROM toks WHERE word <> '' GROUP BY word
    ), pos AS (
        SELECT word, cnt,
               unnest(generate_series(1, CAST(length(word) - 1 AS BIGINT))) AS i
        FROM wc WHERE length(word) >= 2
    ), pairs AS (
        SELECT substr(word, CAST(i AS INT), 1) AS l,
               substr(word, CAST(i AS INT) + 1, 1) AS r,
               SUM(cnt) AS freq
        FROM pos GROUP BY 1, 2
    ), top AS (
        SELECT l, r, freq FROM pairs ORDER BY freq DESC, l, r LIMIT 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM wc) AS n_words,
           CAST(6 AS BIGINT) AS n_merges,
           l AS first_left,
           r AS first_right,
           CAST(freq AS BIGINT) AS first_freq,
           TRUE AS syms_strictly_decreasing
    FROM top
    """,
)
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE TOKENIZER TRAINING (operators/bpe.bpe_train;
    Sennrich et al. ACL 2016) — the op a training platform runs before
    tokenizing the corpus: learn 6 merges from the documents table's
    word counts (6 merges). Oracle strategy, mixed exact + invariant like the ANN
    ladder: the FIRST learned merge is fully SQL-derivable (top
    weighted adjacent character pair over distinct words, tie-break
    freq DESC then lexicographic — DuckDB recomputes it bit-exactly,
    including the tie-break), later rounds depend on earlier rewrites no
    SQL can express, so they ride two a-priori claims instead: all 6
    requested merges are learnable on this corpus (every round's best
    pair clears the frequency floor — word-soup fixtures are nowhere
    near the degenerate tail), and the corpus-weighted symbol total
    decreases STRICTLY every round (each applied merge rewrites at
    least one occurrence — a theorem). The learned merge table is the
    driver-resident model artifact, same contract as kmeans centers;
    per-round work touches only the Zipf-bounded distinct-word table,
    never the corpus."""
    d = load_table(spark, sf_dir, "documents")
    merges, totals, n_words = B.trained_merges(d, n_merges=6)
    dec = all(b < a for a, b in zip(totals, totals[1:]))
    first = merges[0] if merges else ("", "", 0)
    return spark.createDataFrame(
        [
            (
                n_words,
                len(merges),
                first[0],
                first[1],
                first[2],
                dec and len(totals) == len(merges) + 1,
            )
        ],
        "n_words bigint, n_merges bigint, first_left string, "
        "first_right string, first_freq bigint, syms_strictly_decreasing boolean",
    )


@query(
    "llm_bpe_tokenize_corpus",
    tags=("L4", "U3", "A1"),
    oracle="""
    WITH w AS (
        SELECT source,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw,
               length(replace(text, ' ', '')) AS nc
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS word_total,
           CAST(SUM(nc) AS BIGINT) AS char_total,
           TRUE AS subwords_bounded
    FROM w GROUP BY source
    """,
)
def llm_bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale BPE TOKENIZATION with the trained merge table
    (operators/bpe.bpe_apply) — the pass that actually touches 100 TB:
    merge table in the task closure (kilobytes), corpus through ONE
    narrow Arrow stage, per-batch word->subword memoization (Zipf: a
    batch repeats few distinct words, so the sequential rewrite runs
    per distinct word, not per token). Training itself is shared with
    llm_bpe_train through the per-corpus-frame model cache
    (operators/bpe.trained_merges — one training run per session, the
    kmeans-centers reuse contract). Oracle: word and char totals per
    source are SQL-exact (split semantics mirrored down to empty-token
    filtering and space-only char removal); the subword total sits
    strictly between them BY THEOREM (>=1 subword per word, <=1 subword
    per char), which the boolean gates corpus-wide — so a tokenizer
    that drops words, splits on the wrong boundary, or counts pad
    symbols breaks the hash."""
    d = load_table(spark, sf_dir, "documents")
    merges, _totals, _n_words = B.trained_merges(d, n_merges=6)
    per_doc = B.bpe_apply(d, merges)
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("word_total"),
            F.sum("n_chars").cast("bigint").alias("char_total"),
            (
                (F.sum("n_words") <= F.sum("n_subwords"))
                & (F.sum("n_subwords") <= F.sum("n_chars"))
            ).alias("subwords_bounded"),
        )
    )


@query(
    "llm_doc_fingerprints",
    tags=("L4", "F5"),
    oracle="""
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                   t -> CAST(ascii(t) * 31 + length(t) AS BIGINT))),
               (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def llm_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (engine-neutral fold, mod 31-bit
    prime => no overflow divergence)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.rolling_fingerprint(T.tokens(F.col("text"))).alias("fingerprint"))


# --------------------------------------------------------------------------
# L2 near-dup: exact n-gram Jaccard (oracle) + MinHash/SimHash (rows-only)
# --------------------------------------------------------------------------


#: DF-capped exact 3-gram Jaccard pairs in DuckDB — also embedded as the
#: edge set of the dedup-clustering oracle (plans/llm_pipeline.py)
NGRAM_JACCARD_SQL = """
    WITH toks AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> concat_ws(' ', string_split(text, ' ')[i],
                                       string_split(text, ' ')[i + 1],
                                       string_split(text, ' ')[i + 2]))))
                   AS shingle
        FROM documents
    ),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    cold AS (
        SELECT t.doc_id, t.source, t.shingle
        FROM toks t
        JOIN (SELECT shingle, COUNT(*) AS dfc FROM toks GROUP BY shingle) d
          USING (shingle)
        WHERE d.dfc * 10 <= (SELECT n FROM nd)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM cold GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS inter
        FROM cold a
        JOIN cold b ON a.source = b.source AND a.shingle = b.shingle
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_id_1, doc_id_2,
           ROUND(CAST(inter AS DOUBLE) / (s1.ns + s2.ns - inter), 4) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = inter.doc_id_1
    JOIN sizes s2 ON s2.doc_id = inter.doc_id_2
"""


def sized_cold_postings(spark: SparkSession, d: DataFrame) -> DataFrame:
    """Shared front end of the exact-Jaccard family (pairs query,
    incremental admission): DF-capped shingle postings with the doc's
    source and per-doc cold-set size.

    The cap denominator is the CORPUS row count (metadata-only on parquet,
    passed as ``n_docs``) — deriving it from the postings would both
    re-evaluate the shingle subtree and diverge from the oracle's
    ``COUNT(*) FROM documents`` whenever a document is too short to shingle.
    The per-doc set size rides along as a window count and is recovered
    with ``first()`` after the intersection groupBy — a separate sizes
    aggregate plus re-joins would re-evaluate the shingle pipeline twice
    more."""
    n_docs = d.agg(F.count(F.lit(1)).alias("__n"))
    posts = D.df_capped_postings(D.shingle_postings(d), n_docs=n_docs).join(
        d.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("doc_id")
    return posts.withColumn("__n", F.count(F.lit(1)).over(w))


def jaccard_intersections(
    sized_a: DataFrame,
    sized_b: DataFrame,
    pair_cond,
    out1: str = "doc_id_1",
    out2: str = "doc_id_2",
) -> DataFrame:
    """Source-blocked postings intersection: equi-join two sized-postings
    frames on (source, shingle) plus the caller's pair predicate (built
    over ``F.col("a.doc_id")`` / ``F.col("b.doc_id")``), then count shared
    shingles per pair. |union| = n1 + n2 - inter downstream."""
    a, b = sized_a.alias("a"), sized_b.alias("b")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & pair_cond,
        )
        .groupBy(F.col("a.doc_id").alias(out1), F.col("b.doc_id").alias(out2))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first(F.col("a.__n")).alias("n1"),
            F.first(F.col("b.__n")).alias("n2"),
        )
    )


def ngram_jaccard_pairs_df(spark: SparkSession, d: DataFrame) -> DataFrame:
    """Shared EDGE DEFINITION of the exact-Jaccard near-dup graph (pairs
    query + degree histogram): DF-capped postings intersection with the
    rounded |inter|/|union| similarity. One place to change the rounding,
    union formula, or pair condition — the consumers and their oracles
    (NGRAM_JACCARD_SQL, embedded verbatim downstream) stay in lockstep.

    Deliberately NOT materialized, because AQE already folds the
    self-join at runtime: the two sides' postings subtrees canonicalize
    identically, so adaptive execution materializes the (source, shingle)
    shuffle ONCE and the second SortMergeJoin side reads it as a
    ReusedExchange — verified on the executed final plan at sf0.1 (one
    live postings pipeline + ReusedExchange; PLAN_AUDIT audits executed
    plans for exactly this reason — the pre-adaptive plan prints both
    sides and overcounts). A localCheckpoint of the EXPLODED postings
    (~100 shingle rows per doc, larger than the corpus itself) measured
    2.9 s vs 1.6 s for the reused form at sf0.1 — writing+rereading the
    explosion costs more than reading the materialized shuffle twice,
    and the same holds at 100 TB unless the postings are a persisted
    index. The persisted-index form lives in
    llm_incremental_dedup_admission, where one side is the index by
    definition (and a FILTER of the other side, so the subtrees are not
    canonically equal and runtime reuse cannot fire — materializing
    measured FASTER there, 13 -> 5 exchanges)."""
    sized = sized_cold_postings(spark, d)
    return jaccard_intersections(
        sized, sized, F.col("a.doc_id") < F.col("b.doc_id")
    ).select(
        "doc_id_1",
        "doc_id_2",
        F.round(
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")),
            4,
        ).alias("jaccard"),
    )


@query("llm_ngram_jaccard_pairs", tags=("L2", "J1", "F5"), oracle=NGRAM_JACCARD_SQL)
def llm_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard via inverted-index join: explode shingles into
    postings, DF-cap hot shingles (a shingle in >10% of docs is boilerplate
    — and would otherwise connect O(n^2) candidate pairs on its own), then
    equi-join postings on (source, shingle) to count intersections;
    |union| = n1 + n2 - inter. No per-pair array ops — pair cost is
    proportional to actual overlap among informative shingles, which is how
    this survives at corpus scale. The oracle reproduces the identical
    integer-arithmetic cutoff (df * 10 <= n_docs)."""
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_df(spark, d)


# -- planted-duplicate recall harness ---------------------------------------
# MinHash/SimHash/LSH signatures derive from xxhash64, which no other engine
# reproduces — so their driver-checkable form is an INVARIANT query: plant
# near-duplicates deterministically (clone every doc_id % PLANT_MOD == 0 with
# one appended token), run the full sketch pipeline over the planted corpus,
# and report recall over the planted pairs as a boolean the oracle can state
# a priori. The planted set itself (count, membership) is pure SQL, so the
# oracle pins it exactly; the sketch pipeline must then find >= 90% of the
# planted pairs or the hash check fails. Measured recall on the driver
# fixtures is 1.0 (30/30 at sf0.01) with signatures that differ in only
# ~1/len(doc) of permutations, so the 0.9 bar is a real margin, not a tune.

PLANT_MOD = 17
PLANT_OFFSET = 10_000_000
PLANT_MARKER = " dupmarker"

PLANTED_RECALL_ORACLE = f"""
    SELECT COUNT(*) AS n_planted, TRUE AS planted_recall_ok
    FROM documents WHERE doc_id % {PLANT_MOD} = 0
"""


def _planted_corpus(d: DataFrame, marker: str = PLANT_MARKER) -> DataFrame:
    """documents plus a clone (id shifted by PLANT_OFFSET, ``marker``
    appended to the text) of every doc with doc_id % PLANT_MOD == 0.
    marker="" plants byte-identical twins — sketch distance exactly 0 by
    construction, so recall 1.0 is guaranteed a priori, not just measured."""
    clones = (
        d.where(F.col("doc_id") % PLANT_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + PLANT_OFFSET)
        .withColumn("text", F.concat(F.col("text"), F.lit(marker)))
    )
    return d.unionByName(clones)


def _planted_recall_report(d: DataFrame, pairs: DataFrame) -> DataFrame:
    """One row: (n_planted, planted_recall_ok) — did ``pairs`` (doc_id_1 <
    doc_id_2) recover >= 90% of the planted clone pairs? Integer arithmetic
    only, so the cutoff is engine-exact."""
    n_planted = d.where(F.col("doc_id") % PLANT_MOD == 0).agg(
        F.count(F.lit(1)).alias("n_planted")
    )
    found = pairs.where(
        (F.col("doc_id_2") == F.col("doc_id_1") + PLANT_OFFSET)
        & (F.col("doc_id_1") % PLANT_MOD == 0)
    ).agg(F.count(F.lit(1)).alias("__found"))
    return n_planted.crossJoin(found).select(
        "n_planted",
        (F.col("__found") * 10 >= F.col("n_planted") * 9).alias("planted_recall_ok"),
    )


@query("llm_minhash_near_dup", tags=("L2",), oracle=PLANTED_RECALL_ORACLE)
def llm_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup over the planted corpus, Jaccard-verified
    (threshold 0.5), reported as planted-pair recall. Scale path: banded
    equi-join on (band, band_hash), never all-pairs; exact-Jaccard verify
    touches candidate pairs only. Raw pair output stays available via
    operators.dedup (lsh_candidate_pairs + jaccard_verify); recall vs the
    exact baseline is additionally asserted in tests/test_llm_ops.py."""
    d = load_table(spark, sf_dir, "documents")
    corpus = _planted_corpus(d)
    posts = D.shingle_postings(corpus)
    sigs = D.minhash_signatures(posts)
    cands = D.lsh_candidate_pairs(sigs)
    return _planted_recall_report(d, D.jaccard_verify(cands, posts, threshold=0.5))


@query("llm_winnowing_near_dup", tags=("L2", "W3"), oracle=PLANTED_RECALL_ORACLE)
def llm_winnowing_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint near-dup (Schleimer/Wilkerson/Aiken SIGMOD
    2003 — operators/dedup.winnow_fingerprints) over a PREFIX-planted
    corpus: clones get a marker PREPENDED, shifting every token
    position, which is exactly the transformation winnowing is built
    for and sketch banding is not — selection is local, so a document
    embedded verbatim in another contributes its ENTIRE fingerprint set
    to the host. That containment is a THEOREM for docs of at least
    k + window - 1 tokens (shorter docs emit only a partial-window
    fingerprint the host need not select; every fixture doc here has
    >= 10 tokens, clearing the k=4/window=4 floor of 7), so the
    verifier runs at overlap coefficient EXACTLY
    1.0 (integer form: n_inter >= min(|fp_1|, |fp_2|)), like the
    byte-identical SimHash-banded point — not a tuned measurement.
    Construction is row-form (posexplode + lead k-grams + a framed
    window MIN — the W3 carrier here), fully codegen'd.

    Postings are DF-CAPPED before the pair join (1/10, the MinHash
    pipeline's cap): winnowing selects FOR corpus-hot values by design —
    a boilerplate run shared by many docs fingerprints identically in
    all of them, so an uncapped fp join degenerates toward n^2 on
    boilerplate-bearing corpora. The cap drops a VALUE globally, from
    both sides of every pair, so planted containment survives it
    (measured: 295/295 recall at sf0.1, 2941/2941 at the 10x tier);
    the one theoretical leak — a planted doc whose EVERY fingerprint is
    corpus-hot — is a doc that is pure boilerplate, which the 0.9
    recall gate (and the corpus pipeline's boilerplate filter) is
    allowed to treat as noise."""
    d = load_table(spark, sf_dir, "documents")
    clones = (
        d.where(F.col("doc_id") % PLANT_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + PLANT_OFFSET)
        .withColumn("text", F.concat(F.lit("wnw planted prefix marker "), F.col("text")))
    )
    corpus = d.unionByName(clones)
    posts = D.winnow_fingerprints(corpus)
    # n_docs from the corpus scan, NOT df_capped_postings' default
    # count_distinct(doc_id)-over-postings: the default re-plans the whole
    # posexplode+window fingerprint subtree just for the denominator. The
    # corpus count is >= the posted-doc count (docs under k tokens post
    # nothing), so the cap keeps at least as many postings — containment
    # recall can only improve.
    capped = D.df_capped_postings(
        posts.withColumnRenamed("fp", "shingle"),
        n_docs=corpus.agg(F.count(F.lit(1))),
    ).withColumnRenamed("shingle", "fp")
    pairs = D.winnow_overlap_pairs(capped, threshold_num=1, threshold_den=1)
    return _planted_recall_report(d, pairs)


@query("llm_simhash_near_dup", tags=("L2",), oracle=PLANTED_RECALL_ORACLE)
def llm_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-distance near-dup within source blocks over the
    planted corpus (clones keep their source, so each planted pair shares a
    block), reported as planted-pair recall."""
    d = load_table(spark, sf_dir, "documents")
    corpus = _planted_corpus(d)
    sh = D.simhash(corpus)
    blocking = corpus.select("doc_id", F.col("source").alias("block"))
    return _planted_recall_report(d, D.simhash_near_pairs(sh, blocking, max_hamming=16))


@query("llm_simhash_banded_near_dup", tags=("L2",), oracle=PLANTED_RECALL_ORACLE)
def llm_simhash_banded_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide SimHash near-dup via bit-segment banding (no blocking
    key): candidates from a (band, segment) equi-join — exact recall for
    hamming <= 3 with 4 bands (pigeonhole: 4 > 3), never an all-pairs
    compare. 4 bands of 15 bits beat 7 of 9: segments are 64x more
    selective, so the candidate join shrinks ~10x on the fixture corpus.
    Invariant form plants byte-identical twins (marker=""): their simhash
    distance is 0 by construction, so the pigeonhole guarantee makes 100%
    planted recall a theorem the oracle can assert, not a measurement."""
    d = load_table(spark, sf_dir, "documents")
    corpus = _planted_corpus(d, marker="")
    pairs = D.simhash_banded_pairs(D.simhash(corpus), bands=4, max_hamming=3)
    return _planted_recall_report(d, pairs)


# --------------------------------------------------------------------------
# L3 similarity search (cosine top-k oracle-checked; LSH rows-only)
# --------------------------------------------------------------------------


def cos_sim_sql(a: str, b: str, digits: int) -> str:
    """DuckDB cosine-similarity expression mirroring functions/vectors'
    dot/norm op-for-op (cast-to-double per element, left fold from 0), so
    per-row similarities are bit-identical to the Spark side before
    rounding. ONE definition for every oracle that compares cosines
    (exact-top-k CTEs, filtered search, decontamination) — a parity tweak
    to the fold lands in all of them at once instead of drifting across
    hand-maintained copies."""
    return f"""ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(range(1, len({a}) + 1),
                             i -> CAST({a}[i] AS DOUBLE)
                                  * CAST({b}[i] AS DOUBLE))),
                         (a, b) -> a + b)
                 / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform({a},
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                         (a, b) -> a + b))
                    * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform({b},
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                         (a, b) -> a + b))), {digits})"""


#: DuckDB CTE chain ending in exact_topk(query_id, neighbor_id, rank, sim)
#: — brute-force cosine top-5 for the vec_id < 20 query set, the shared
#: ground truth for llm_cosine_topk and both ANN recall oracles.
COSINE_TOPK_CTES = f"""
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {cos_sim_sql("q.embedding", "c.embedding", 6)} AS sim
        FROM q JOIN embeddings c ON q.vec_id != c.vec_id
    ),
    exact_topk AS (
        SELECT query_id, neighbor_id, rank, sim FROM (
            SELECT query_id, neighbor_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 5
    )
"""

#: Invariant oracle for the approximate top-k queries: the exact ground
#: truth is pure SQL (count + a rank-weighted checksum pins it), and the
#: ANN side must clear the recall bar for the boolean to hash-match.
ANN_RECALL_ORACLE = f"""
    WITH {COSINE_TOPK_CTES}
    SELECT COUNT(DISTINCT query_id) AS n_queries,
           COUNT(*) AS n_exact,
           CAST(SUM(neighbor_id * rank) AS BIGINT) AS truth_checksum,
           TRUE AS recall_ok
    FROM exact_topk
"""


#: per-corpus cache of the exact ground-truth table every ANN recall query
#: measures against (same session-artifact discipline as the learned
#: quantizer's cell map, similarity._LEARNED_CELLS): six registered queries
#: compare to the IDENTICAL brute-force top-5 of the standard probe set, so
#: recomputing the Q x N scan per query is pure waste. Bounded: <= Q*k rows
#: of (ids, rank, sim), persisted; entries die with the corpus frame.
_EXACT_TRUTH: "WeakKeyDictionary[DataFrame, DataFrame]" = WeakKeyDictionary()


def _exact_ground_truth(e: DataFrame) -> DataFrame:
    """Exact cosine top-5 of the standard probe set (vec_id < 20) over
    corpus ``e`` — cached per corpus frame, see ``_EXACT_TRUTH``. The
    standalone llm_cosine_topk query keeps its own uncached plan (its J8
    crossJoin shape is part of what the audit pins)."""
    try:
        cached = _EXACT_TRUTH.get(e)
    except TypeError:
        cached = None
    if cached is not None:
        return cached
    truth = S.cosine_topk(e.where(F.col("vec_id") < 20), e, k=5).persist()
    try:
        _EXACT_TRUTH[e] = truth
    except TypeError:
        pass
    return truth


def _ann_recall_report(
    exact: DataFrame, ann: DataFrame, floor: tuple[int, int] = (1, 4)
) -> DataFrame:
    """One row: exact-baseline stats (count, rank-weighted checksum — both
    oracle-reproducible) plus recall_ok = |ANN hits in exact top-k| >=
    ``floor`` (a fraction as num/den; default 1/4). Measured recall on the
    driver fixture is ~0.43 (LSH) / ~0.42 (IVF, nprobe=3/10), so 0.25 is
    margin, not tuning; the hifi PQ variant raises the gate to 4/5 against
    its measured 0.88. Integer arithmetic (hits * den >= num * n_exact)
    keeps the cutoff engine-exact.

    Single pass over the exact baseline: the ANN pair set (<= Q*k rows)
    broadcasts onto a left join and the hit count rides the same aggregate
    as the stats — a separate stats agg + semi join would evaluate the
    brute-force Q x N topk subtree twice."""
    hits = F.broadcast(
        ann.select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("__hit", F.lit(1))
    )
    return (
        exact.join(hits, ["query_id", "neighbor_id"], "left")
        .agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.col("neighbor_id") * F.col("rank")).cast("bigint").alias("truth_checksum"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("__hits"),
        )
        .select(
            "n_queries",
            "n_exact",
            "truth_checksum",
            (F.col("__hits") * floor[1] >= F.col("n_exact") * floor[0]).alias(
                "recall_ok"
            ),
        )
    )


@query(
    "llm_cosine_topk",
    tags=("L3", "J8", "W4", "F5"),
    oracle=f"""
    WITH {COSINE_TOPK_CTES}
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS sim FROM exact_topk
    """,
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a 20-query set (exact ANN baseline)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(e.where(F.col("vec_id") < 20), e, k=5)


@query("llm_ann_lsh_topk", tags=("L3",), oracle=ANN_RECALL_ORACLE)
def llm_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the N^2-free scale path), reported
    as recall vs the exact cosine baseline. The exact side's count and
    rank-weighted checksum are oracle-pinned; the hyperplane bucketing is
    xxhash64-seeded, so its contribution is the recall boolean. Raw top-k
    rows stay available via operators.similarity.lsh_topk."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return _ann_recall_report(_exact_ground_truth(e), S.lsh_topk(q, e, k=5))


@query("llm_ann_ivf_topk", tags=("L3",), oracle=ANN_RECALL_ORACLE)
def llm_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k — label-partitioned inverted lists + centroid
    probing (nprobe=3 of 10 lists => ~30% of the corpus scanned per query)
    — reported as recall vs the exact cosine baseline (same invariant form
    as llm_ann_lsh_topk)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return _ann_recall_report(_exact_ground_truth(e), S.ivf_topk(q, e, k=5, nprobe=3))


@query("llm_ann_ivf_pq_topk", tags=("L3",), oracle=ANN_RECALL_ORACLE)
def llm_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k — the full compressed-index search: coarse
    probe (nprobe=3 of 10 lists), PQ asymmetric-distance pruning over
    4x4-center codes (candidates ranked by 4 table lookups, vectors
    untouched), exact re-rank of the top-120 ADC survivors per query.
    Same recall-invariant form as the LSH/IVF queries. The rerank budget
    is ABSOLUTE (the FAISS parameterization): at the driver fixture it
    prunes ~20% of probed candidates and measures 0.34 recall against the
    0.25 floor; at 10x corpus the same budget prunes >90% — compression
    grows with the corpus while the recall gate is pinned at the
    fixture."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return _ann_recall_report(
        _exact_ground_truth(e),
        S.ivf_pq_topk(q, e, k=5, nprobe=3, rerank=120),
    )


@query(
    "llm_ivf_train_kmeans",
    tags=("L3",),
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS lists_bounded,
           TRUE AS inertia_monotone
    FROM embeddings
    """,
)
def llm_ivf_train_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-quantizer training for IVF: 3 Lloyd's iterations, k=10, over
    the embedding corpus (operators/similarity.kmeans_train). Invariant
    form, like the ANN recall queries: the oracle states a priori that
    every vector is assigned exactly once, cell ids stay bounded by k, and
    the inertia sequence is non-increasing (Lloyd's guarantee) — all
    properties an engine must deliver regardless of float rounding, so the
    check is engine-exact without comparing raw centroids."""
    e = load_table(spark, sf_dir, "embeddings")
    assign, inertias = S.kmeans_train(e, k=10, iters=3)
    monotone = all(
        b <= a * (1 + 1e-9) + 1e-6 for a, b in zip(inertias, inertias[1:])
    )
    return assign.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        # BOUNDED cells, not count_distinct == k: Lloyd's does NOT
        # guarantee non-empty clusters (a migrating outlier init can empty
        # one on valid data), so pinning 10 in the oracle would turn a
        # legitimate empty cell into a hard bench failure — the same safe
        # form llm_kmeans_large_k uses
        ((F.max("cid") < F.lit(10)) & (F.min("cid") >= F.lit(0))).alias(
            "lists_bounded"
        ),
        (F.lit(monotone) & (F.count(F.lit(1)) == F.count_distinct("vec_id"))).alias(
            "inertia_monotone"
        ),
    )


@query("llm_ann_ivf_learned_topk", tags=("L3",), oracle=ANN_RECALL_ORACLE)
def llm_ann_ivf_learned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END learned IVF: the coarse quantizer is TRAINED (k=10
    k-means cells via operators/similarity.kmeans_train, 2 Lloyd's
    iterations) and its assignments — not the label column — form the
    inverted lists that ivf_topk probes (nprobe=3). This closes the loop
    the label-partitioned llm_ann_ivf_topk leaves open: quantizer fit,
    cell attachment, probe, and exact re-rank all in one plan. Same
    recall-invariant oracle as the other ANN variants; measured recall at
    the driver fixture is 0.76 (learned cells beat the arbitrary label
    partition's 0.42 because probes follow actual data density)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return _ann_recall_report(
        _exact_ground_truth(e),
        S.ivf_learned_topk(q, e, k=5, nprobe=3, n_lists=10, train_iters=2),
    )


@query("llm_ann_ivf_pq_learned_topk", tags=("L3",), oracle=ANN_RECALL_ORACLE)
def llm_ann_ivf_pq_learned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULLY learned compressed index: k-means coarse quantizer (k=10
    cells, 2 Lloyd's iterations) + PQ codes + ADC pruning (top-120
    survivors) + exact re-rank — llm_ann_ivf_pq_topk with the label
    partition replaced by trained cells (operators/similarity.
    ivf_pq_learned_topk). Same recall-invariant oracle; measured recall at
    the driver fixture is 0.62 vs the label-partitioned PQ variant's 0.34
    — learned cells recover most of what ADC pruning gives up."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return _ann_recall_report(
        _exact_ground_truth(e),
        S.ivf_pq_learned_topk(q, e, k=5, nprobe=3, rerank=120, n_lists=10, train_iters=2),
    )


@query("llm_ann_ivf_pq_hifi_topk", tags=("L3",), oracle=ANN_RECALL_ORACLE)
def llm_ann_ivf_pq_hifi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGH-FIDELITY operating point of the learned IVF-PQ index: more
    probes (nprobe=6 of 10 learned cells) and a larger exact-rerank budget
    (400 ADC survivors per query) buy recall 0.88 at the driver fixture vs
    the standard point's 0.62 — and this query's gate is raised to 0.8
    (hits * 5 >= 4 * n_exact), not the family's 0.25 floor, so the oracle
    row actually pins the high-recall contract. Same quantizer artifact as
    the other learned queries (shared training via attach_learned_cells);
    the full recall-vs-cost pareto, including the absolute-budget
    degradation at 10x corpus and how nprobe/rerank must scale with N, is
    recorded in DESIGN.md's IVF-PQ section."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return _ann_recall_report(
        _exact_ground_truth(e),
        S.ivf_pq_learned_topk(
            q, e, k=5, nprobe=6, rerank=400, n_lists=10, train_iters=2
        ),
        floor=(4, 5),
    )


@query("llm_ann_ivf_pq_scaled_topk", tags=("L3",), oracle=ANN_RECALL_ORACLE)
def llm_ann_ivf_pq_scaled_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE-AWARE operating point of the learned IVF-PQ index: ALL of
    (n_lists, nprobe, rerank) are COMPUTED from the corpus size
    (operators/similarity.scaled_pq_budgets — n_lists = ceil(sqrt(N)),
    nprobe = ceil(sqrt(n_lists)), rerank = expected candidate count).
    This turns DESIGN.md's prose rule ("production grows n_lists ~
    sqrt(N)") into code: the fixed hifi point's 0.8-recall contract
    decays to 0.26 at 4x corpus and the old flat-cell scaled rule held
    recall only at O(N) per-query cost, while this point's candidate set
    grows ~ N^0.75 (109 -> 312 -> 1691 over 40x data) and measures 0.94
    at sf0.01 AND 0.97 at sf0.1 under the SAME gate (hits * 5 >= 4 *
    n_exact, part of the oracle row; the sf0.1 leg is additionally pinned
    by tests/test_llm_ops.py::test_scaled_pq_recall_holds_at_sf01).
    Corpus sizing is one COUNT aggregate (a single long to the driver —
    the same bounded-collect discipline as kmeans centroids); past
    fixture scale the quantizer already rides kmeans_train's
    shuffle-free GEMM assignment path built for exactly this n_lists
    growth (the literal fold is kept only for tiny k)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    n_lists, nprobe, rerank = S.scaled_pq_budgets(e.count())
    return _ann_recall_report(
        _exact_ground_truth(e),
        S.ivf_pq_learned_topk(
            q, e, k=5, nprobe=nprobe, rerank=rerank, n_lists=n_lists, train_iters=2
        ),
        floor=(4, 5),
    )


@query("llm_ann_ivf_pq_opq_topk", tags=("L3", "U2"), oracle=ANN_RECALL_ORACLE)
def llm_ann_ivf_pq_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-ROTATED operating point of the learned IVF-PQ index: the
    corpus is projected through a learned orthogonal rotation
    (operators/similarity.opq_rotation — PCA + eigenvalue allocation, the
    parametric OPQ of Ge et al. CVPR 2013) before the subspace split, so
    each of the 4 sub-codebooks receives balanced variance (measured
    max/min subspace-variance ratio 1.9 -> 1.02) instead of whatever
    dims happen to be adjacent. Budgets are the SAME scale-derived
    (n_lists, nprobe, rerank) as llm_ann_ivf_pq_scaled_topk, so the two
    rows differ only in the rotation; R is orthogonal, so ground truth is
    provably unchanged (pytest pins exact-topk equality under R) and the
    oracle row is the unrotated ANN_RECALL_ORACLE verbatim. Measured
    recall at the gate's 0.8 bar: 0.92 at sf0.01, 0.98 at sf0.1 — and
    where ADC pruning actually bites (rerank halved below the candidate
    count) the rotation buys 0.46 -> 0.53 and 0.50 -> 0.57 over the raw
    split. Honest caveat: with this repo's deliberately tiny 4x4
    codebook the full-budget gain is marginal; the balanced-variance
    property is what makes a production 16x256 codebook's codes less
    lossy.

    Scale shape: the rotation is learned in ONE corpus pass of Arrow
    partials (1+d+d^2 doubles per batch to the driver — the kmeans
    driver-resident-centers contract) and applied as a shuffle-free
    Arrow GEMM; everything downstream is the unchanged learned-IVF-PQ
    plan. The rotated frame and its trained quantizer are per-corpus
    session artifacts (similarity._OPQ_ROTATED / _LEARNED_CELLS)."""
    e = load_table(spark, sf_dir, "embeddings")
    er = S.opq_rotate(e)
    q = er.where(F.col("vec_id") < 20)
    n_lists, nprobe, rerank = S.scaled_pq_budgets(e.count())
    return _ann_recall_report(
        _exact_ground_truth(e),
        S.ivf_pq_learned_topk(
            q, er, k=5, nprobe=nprobe, rerank=rerank, n_lists=n_lists, train_iters=2
        ),
        floor=(4, 5),
    )


#: per-corpus cache of the frozen quantizer (same session-artifact
#: discipline as _EXACT_TRUTH / similarity._LEARNED_CELLS): five
#: registered queries train the IDENTICAL quantizer — deterministic
#: recipe, deterministic result — so re-running Lloyd's per query is
#: pure waste. load_table returns one frame per (session, sf, table),
#: which is what makes the WeakKeyDictionary hit across queries; the
#: entry is k centers of d doubles, dying with the corpus frame.
_FROZEN_Q: "WeakKeyDictionary[DataFrame, tuple[int, list]]" = WeakKeyDictionary()


def _frozen_quantizer(e: DataFrame) -> tuple[int, list]:
    """The frozen-index family's ONE quantizer recipe — sqrt-rule cell
    count from the FULL corpus, trained on the even half (vec_id % 2 ==
    0), 2 Lloyd's iterations. Shared by every frozen-index query
    (add/drift/delete/compaction/persistence) so the sizing rule cannot
    drift per call site — and cached per corpus, so it TRAINS once per
    session (train-once is the family's whole contract)."""
    import math

    try:
        cached = _FROZEN_Q.get(e)
    except TypeError:
        # Non-hashable / non-weak-referenceable frame (e.g. Spark
        # Connect proxies): fall back to uncached training, matching
        # _exact_ground_truth and similarity._LEARNED_CELLS.
        cached = None
    if cached is not None:
        return cached
    n_lists = max(5, math.ceil(math.sqrt(e.count())))
    _, _inertias, centers = S.kmeans_train(
        e.where(F.col("vec_id") % 2 == 0),
        k=n_lists,
        iters=2,
        return_centers=True,
    )
    artifact = (n_lists, centers)
    try:
        _FROZEN_Q[e] = artifact
    except TypeError:
        pass
    return artifact


def _planted_twins(e: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(probe queries, corpus-with-twins, retrying delete log): a
    byte-identical twin of every probe vector at NEGATIVE ids — a-priori
    collision-free at every tier, including the replicated scaled
    fixtures whose ids live at k*10^9 offsets — with each twin id logged
    twice (the duplicate-tolerant mask contract)."""
    q = e.where(F.col("vec_id") < 20)
    twins = q.withColumn("vec_id", -F.col("vec_id") - 1)
    dead = twins.select("vec_id")
    return q, e.unionByName(twins), dead.unionByName(dead)


@query("llm_ann_frozen_add_topk", tags=("L3", "U2"), oracle=ANN_RECALL_ORACLE)
def llm_ann_frozen_add_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX MAINTENANCE under the oracle — the FAISS train()-once /
    add()-forever pattern: the coarse quantizer is trained on HALF the
    corpus (vec_id % 2 = 0, 2 Lloyd's iterations, sqrt-rule cell count),
    its centers are FROZEN (kmeans_train(return_centers=True) — the
    driver-resident quantizer artifact), and the ENTIRE corpus — the
    half the quantizer never saw included — joins the index through one
    shuffle-free nearest-center assignment pass
    (operators/similarity.assign_to_centers + ivf_frozen_add_topk). At
    100 TB this is what keeps a continuously-growing vector index
    maintainable: ingestion assigns new batches in a narrow Arrow pass;
    no Lloyd's iteration ever re-shuffles the corpus.

    Gate: recall >= 0.75 (hits * 4 >= 3 * n_exact) against the cached
    exact ground truth; measured 0.84 at sf0.01 and 0.92 at sf0.1 at
    nprobe = 0.5 * n_lists. The honest cost of freezing, stated: a
    sample-trained frozen quantizer needs a larger probe fraction than a
    full-data one for the same recall (the probe sweep is in the
    operator docstring) — that probe budget is the price of never
    retraining."""
    import math

    e = load_table(spark, sf_dir, "embeddings")
    n_lists, centers = _frozen_quantizer(e)
    q = e.where(F.col("vec_id") < 20)
    return _ann_recall_report(
        _exact_ground_truth(e),
        S.ivf_frozen_add_topk(
            q, e, centers, k=5, nprobe=max(4, math.ceil(0.5 * n_lists))
        ),
        floor=(3, 4),
    )


@query(
    "llm_frozen_index_drift_trigger",
    tags=("L3", "A1", "F3"),
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(0 AS BIGINT) AS identity_tv_ppm,
           FALSE AS identity_retrain,
           TRUE AS drift_retrain
    FROM embeddings
    """,
)
def llm_frozen_index_drift_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen index's "until drift" clause, executable
    (similarity.cell_occupancy_drift): llm_ann_frozen_add_topk freezes a
    half-corpus-trained quantizer and promises ingestion never retrains;
    this query runs the monitor that decides when the promise expires,
    under two a-priori batches:

    - IDENTITY batch (the full corpus, re-assigned under the same frozen
      centers): deterministic assignment means identical occupancy
      counts, identical integer floor-shares, hence identity_tv_ppm
      EXACTLY 0 and no retrain — a theorem, not a measurement.
    - PLANTED-DRIFT batch (only the vectors of the baseline's
      smallest-occupancy nonempty cell — the worst-case single-cell
      pile-up): its occupancy is 100% one cell whose baseline share is
      <= 10^6/n_nonempty <= 500000 ppm, so tv_ppm >= 10^6 - 500000 -
      n_cells > the 200000 threshold whenever the baseline occupies >= 2
      cells — which tests/test_llm_ops.py pins on the real fixtures (a
      corpus degenerate enough to occupy ONE cell of a sqrt-rule
      quantizer is all-identical vectors, where no drift is detectable
      or needed).

    Why occupancy drift is the right trigger: piled-up cells are exactly
    what decays frozen-index quality — fixed-nprobe recall drops while
    scan cost rises. The monitor costs the assignment pass ingest
    already pays plus a k-row compare; the threshold (TV > 0.2) and the
    integer-ppm parity discipline are dq_distribution_drift's."""
    e = load_table(spark, sf_dir, "embeddings")
    _n_lists, centers = _frozen_quantizer(e)
    # the baseline assignment feeds THREE legs (identity compare, min-cell
    # pick, drift batch): persist so the corpus GEMM pass runs once for
    # them — two integer columns, the _LEARNED_CELLS KB-residue contract.
    # The identity batch stays a SEPARATE assignment evaluation on
    # purpose: recompute-determinism under the frozen centers is the very
    # claim identity_tv_ppm == 0 certifies
    base = S.assign_to_centers(e, centers).select("vec_id", "cid").persist()
    identity = S.assign_to_centers(e, centers).select("cid")
    min_cell = (
        base.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").asc(), F.col("cid").asc())
        .limit(1)
        .select("cid")
    )
    drift_batch = base.join(F.broadcast(min_cell), "cid").select("cid")
    id_rep = S.cell_occupancy_drift(base, identity).select(
        F.col("tv_ppm").alias("identity_tv_ppm"),
        F.col("retrain").alias("identity_retrain"),
    )
    dr_rep = S.cell_occupancy_drift(base, drift_batch).select(
        F.col("retrain").alias("drift_retrain")
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_vectors"))
        .crossJoin(F.broadcast(id_rep))
        .crossJoin(F.broadcast(dr_rep))
        .select(
            "n_vectors", "identity_tv_ppm", "identity_retrain", "drift_retrain"
        )
    )


@query(
    "llm_ann_frozen_delete_topk",
    tags=("L3", "W4"),
    oracle=f"""
    WITH {COSINE_TOPK_CTES}
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS sim FROM exact_topk
    """,
)
def llm_ann_frozen_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index lifecycle's DELETE verb under a ROW-EXACT planted-twin
    oracle (operators/similarity.ivf_frozen_delete_topk — FAISS
    ``remove_ids`` as one left-anti mask BEFORE the probe): plant a
    byte-identical twin of every query vector (negative ids — a-priori
    collision-free at every tier, including the replicated scaled
    fixtures whose ids live at k*10^9 offsets), tombstone the twins with
    a RETRYING delete log (each id logged twice — the duplicate-tolerant
    mask contract), and probe EXHAUSTIVELY. The oracle is then a
    theorem, not a recall gate: had any tombstone leaked, its twin wins
    rank 1 at cosine exactly 1.0 and the row hash breaks; with the mask
    correct, ranks RE-CLOSE and the result is cell-for-cell the exact
    brute-force top-5 over the original corpus — the same exact_topk CTE
    llm_cosine_topk pins, now reached through the frozen-quantizer
    assign -> mask -> probe -> rerank pipeline.

    Scale shape: deletion costs one id anti-join (broadcast while the
    tombstone set is small) — no vector moves, no cell retrains; the
    exhaustive probe is this QUERY's verification discipline, not the
    operator's production setting (partial-probe recall rides
    llm_ann_frozen_add_topk's gate)."""
    e = load_table(spark, sf_dir, "embeddings")
    n_lists, centers = _frozen_quantizer(e)
    q, corpus, dead_log = _planted_twins(e)
    return S.ivf_frozen_delete_topk(
        q, corpus, centers, dead_log, k=5, nprobe=n_lists
    )


@query(
    "llm_tombstone_compaction_trigger",
    tags=("L3", "A1", "F4"),
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_under,
               CAST(SUM(CASE WHEN vec_id % 10 <> 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over
        FROM embeddings)
    SELECT n_total,
           n_under AS under_deleted,
           n_under * 1000000 // n_total AS under_ppm,
           (n_under * 1000000 // n_total) > 200000 AS under_rebuild,
           n_over AS over_deleted,
           n_over * 1000000 // n_total AS over_ppm,
           (n_over * 1000000 // n_total) > 200000 AS over_rebuild
    FROM m
    """,
)
def llm_tombstone_compaction_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tombstoned index's COMPACTION TRIGGER, executable
    (operators/similarity.tombstone_load_report): the mask join wastes
    exactly the deleted fraction of every scan, and this monitor decides
    — from id counts alone, never vectors — when that waste crosses the
    rebuild line (integer ppm > 200000, the drift trigger's parity
    discipline: ``div`` floors identically in both engines). Two
    a-priori legs over the same corpus:

    - UNDER leg: every vec_id % 10 == 0 tombstoned — ~10% load, below
      the 20% line. The delete log is ADVERSARIAL on purpose: each id
      logged three times (retries) plus a stale cohort of never-indexed
      negative ids — duplicates must not fan out the join (n_total would
      misreport) and stale ids must not count (they waste no scan work).
    - OVER leg: the complement (% 10 != 0) — ~90% load, rebuild fires.

    The oracle recomputes both legs' arithmetic from the base table, so
    every output cell is checked, not just the booleans."""
    e = load_table(spark, sf_dir, "embeddings")
    ids = e.select("vec_id")
    # a BOUNDED stale cohort (100 negative ids — never in any tier's
    # corpus) proves the matched-only property at constant cost; a
    # corpus-sized stale set would double the delete log's shuffle mass
    # just to prove the same thing
    stale = spark.range(100).select((-F.col("id") - 1).alias("vec_id"))
    under = ids.where(F.col("vec_id") % 10 == 0)
    under_log = under.unionByName(under).unionByName(under).unionByName(stale)
    over_log = ids.where(F.col("vec_id") % 10 != 0).unionByName(stale)
    rep_u = S.tombstone_load_report(e, under_log).select(
        "n_total",
        F.col("n_deleted").alias("under_deleted"),
        F.col("deleted_ppm").alias("under_ppm"),
        F.col("rebuild").alias("under_rebuild"),
    )
    rep_o = S.tombstone_load_report(e, over_log).select(
        F.col("n_deleted").alias("over_deleted"),
        F.col("deleted_ppm").alias("over_ppm"),
        F.col("rebuild").alias("over_rebuild"),
    )
    return rep_u.crossJoin(F.broadcast(rep_o))


@query(
    "llm_ann_index_compaction",
    tags=("L3", "J4", "O4"),
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {cos_sim_sql("q.embedding", "c.embedding", 6)} AS sim
        FROM q JOIN embeddings c
          ON q.vec_id != c.vec_id AND c.vec_id % 4 <> 0
    ),
    exact_topk AS (
        SELECT query_id, neighbor_id, rank, sim FROM (
            SELECT query_id, neighbor_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 5
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN vec_id % 4 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n4
          FROM embeddings)
    SELECT m.n + 20 AS n_total_pre,
           m.n4 + 20 AS n_dead_pre,
           ((m.n4 + 20) * 1000000 // (m.n + 20)) > 200000 AS pre_rebuild,
           m.n - m.n4 AS n_live,
           CAST(0 AS BIGINT) AS post_deleted_ppm,
           FALSE AS post_rebuild,
           TRUE AS topk_equal,
           (SELECT CAST(SUM(neighbor_id * rank) AS BIGINT) FROM exact_topk)
               AS topk_checksum
    FROM m
    """,
)
def llm_ann_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full trigger -> action arc of tombstone maintenance, ONE
    Catalyst plan (operators/similarity.ivf_compact — FAISS's
    rebuild-after-remove_ids, reassign mode): tombstone a quarter of the
    corpus plus every planted query twin so the load report provably
    fires (a-priori: (n/4 + 20)/(n + 20) > 20% for any n), compact —
    live set materialized, frozen centers kept, deletion never moves a
    surviving vector so every live cell assignment is unchanged
    (pytest-pinned cell-map equality) — then prove the rebuild changed
    NOTHING a searcher can see and EVERYTHING the scanner pays:

    - post-compact load report returns to exactly (n_live, 0 ppm, no
      rebuild) — the mask join's dead weight is gone;
    - exhaustive-probe top-5 through the compacted index equals the
      pre-compact MASKED search row-for-row (symmetric exceptAll
      difference is empty, computed in-plan — never a driver collect)
      and its rank-weighted checksum equals the exact brute-force top-5
      over the live set, which the oracle recomputes from the base
      table.

    Scale shape: compaction is one id anti-join feeding the index
    rewrite — the cost profile a production rebuild wants; the searcher
    never sees a hole (ranks re-closed before compaction by the mask,
    after it by absence)."""
    e = load_table(spark, sf_dir, "embeddings")
    n_lists, centers = _frozen_quantizer(e)
    q, corpus, twin_log = _planted_twins(e)
    quarter = e.where(F.col("vec_id") % 4 == 0).select("vec_id")
    dead_log = twin_log.unionByName(quarter).unionByName(
        quarter
    )  # retries, again on purpose
    rep_pre = S.tombstone_load_report(corpus, dead_log).select(
        F.col("n_total").alias("n_total_pre"),
        F.col("n_deleted").alias("n_dead_pre"),
        F.col("rebuild").alias("pre_rebuild"),
    )
    live, centers2 = S.ivf_compact(corpus, centers, dead_log, retrain=False)
    rep_post = S.tombstone_load_report(live, dead_log).select(
        F.col("n_total").alias("n_live"),
        F.col("deleted_ppm").alias("post_deleted_ppm"),
        F.col("rebuild").alias("post_rebuild"),
    )
    pre_masked = S.ivf_frozen_delete_topk(
        q, corpus, centers, dead_log, k=5, nprobe=n_lists
    )
    post = S.ivf_frozen_add_topk(q, live, centers2, k=5, nprobe=n_lists)
    diff = (
        pre_masked.exceptAll(post)
        .unionByName(post.exceptAll(pre_masked))
        .agg(F.count(F.lit(1)).alias("__n_diff"))
    )
    chk = post.agg(
        F.sum(F.col("neighbor_id") * F.col("rank"))
        .cast("bigint")
        .alias("topk_checksum")
    )
    return (
        rep_pre.crossJoin(F.broadcast(rep_post))
        .crossJoin(F.broadcast(diff))
        .crossJoin(F.broadcast(chk))
        .select(
            "n_total_pre",
            "n_dead_pre",
            "pre_rebuild",
            "n_live",
            "post_deleted_ppm",
            "post_rebuild",
            (F.col("__n_diff") == 0).alias("topk_equal"),
            "topk_checksum",
        )
    )


@query(
    "llm_ann_index_persistence",
    tags=("L3", "S5"),
    oracle=f"""
    WITH {COSINE_TOPK_CTES}
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS sim FROM exact_topk
    """,
)
def llm_ann_index_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index lifecycle's PERSIST/LOAD verbs (operators/similarity.
    save_ivf_index / load_ivf_index — FAISS write_index/read_index as
    two parquet datasets): train the frozen quantizer, assign the
    corpus, WRITE the index (k-row centers + id-only cell map — vectors
    are never duplicated; the corpus table stays the single source of
    vector truth, so the artifact costs O(k + N ids)), then READ it
    back into fresh frames and search through the LOADED routing state
    at exhaustive probe. The oracle is row-exact: a center perturbed in
    transit, a cell row lost to a partial write, or an id/cid column
    swap would each reroute or drop a candidate and break the hash
    against brute-force top-5. Cell-map and quantizer roundtrip
    equality are additionally pytest-pinned bit-for-bit.

    At 100 TB this is how a vector index survives between pipeline
    runs: the cells dataset is partition-parallel parquet (readable by
    any engine), the quantizer is the same bounded driver artifact it
    was at training time, and reloading costs a metadata-scale read +
    one k-row collect — never a retrain, never a corpus re-shuffle."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    n_lists, centers = _frozen_quantizer(e)
    cellmap = S.assign_to_centers(e, centers).select("vec_id", "cid")
    # path keyed by resolved fixture path (basename collisions) AND pid
    # (a concurrent session's overwrite must never race this session's
    # load — each process owns its artifact; same-process reruns
    # overwrite their own)
    resolved = os.path.realpath(sf_dir.rstrip("/"))
    tag = (
        os.path.basename(resolved).replace(".", "_")
        + "_"
        + hashlib.md5(resolved.encode()).hexdigest()[:8]
    )
    path = f"{tempfile.gettempdir()}/sg_ivfidx_{tag}_{os.getpid()}"
    S.save_ivf_index(cellmap, centers, path)
    loaded_cells, loaded_centers = S.load_ivf_index(spark, path)
    # Sever the returned plan's lineage from the on-disk artifact
    # (eager localCheckpoint), then reclaim the pid-keyed dir — the
    # roundtrip is proven through the checkpointed frames, and no
    # artifact leaks per process/sf tier.
    loaded_cells = loaded_cells.localCheckpoint(eager=True)
    shutil.rmtree(path, ignore_errors=True)
    if len(loaded_centers) != len(centers):
        raise RuntimeError(
            "IVF index roundtrip lost centers: "
            f"saved {len(centers)}, loaded {len(loaded_centers)}"
        )
    q = e.where(F.col("vec_id") < 20)
    return S.ivf_topk(
        q,
        e.join(
            loaded_cells.withColumnRenamed("cid", "__ivf_cell"), "vec_id"
        ),
        k=5,
        nprobe=n_lists,
        list_col="__ivf_cell",
    )


@query(
    "llm_ann_pq_index_persistence",
    tags=("L3", "U2", "S5"),
    oracle=f"""
    WITH {COSINE_TOPK_CTES}
    SELECT COUNT(DISTINCT query_id) AS n_queries,
           COUNT(*) AS n_exact,
           CAST(SUM(neighbor_id * rank) AS BIGINT) AS truth_checksum,
           TRUE AS recall_ok,
           TRUE AS loaded_matches_build
    FROM exact_topk
    """,
)
def llm_ann_pq_index_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSIST/LOAD for the COMPRESSED index family — FAISS
    write_index/read_index extended to IVF-PQ-OPQ (operators/similarity.
    save_pq_index / load_pq_index): learn the OPQ rotation, train the
    scale-budgeted coarse quantizer on the rotated corpus, ENCODE the
    per-vector PQ codes, WRITE all five artifact datasets (cells,
    centroids, codes, codebooks, rotation — vectors never duplicated;
    the artifact costs O(N·(id+codes) + k·d + d^2)), then READ them back
    into fresh frames and search through the LOADED state only: probe
    routing from the stored centroids, ADC from the stored codes and
    codebooks, query vectors rotated by the stored R.

    Two proofs ride the one row: the loaded search clears the same
    0.8-recall gate as llm_ann_ivf_pq_scaled_topk against the
    brute-force oracle, and loaded_matches_build asserts IN-PLAN
    (symmetric exceptAll, never a driver collect) that the reloaded
    search is ROW-EXACT against an in-session search over the same
    routing state — a perturbed centroid, a lost code row, a transposed
    rotation, or a reordered codebook would each reroute or rescore a
    candidate and flip the boolean. Roundtrip bit-equality of every
    artifact piece is additionally pytest-pinned
    (tests/test_llm_ops.py::test_pq_index_roundtrip_is_bit_exact).

    The routing centroids are eagerly materialized ONCE
    (localCheckpoint) and fed to the save AND the in-session search:
    float aggregation order is not replayable across re-executions, so
    'the same index' must mean the same MATERIALIZED artifact — exactly
    the property a persisted index provides at 100 TB, where reloading
    costs a metadata-scale read (k centroids, M codebooks, one d x d
    matrix) plus lazy scans of the id-keyed cell/code maps, never a
    retrain, re-encode, or corpus re-shuffle."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    n_lists, nprobe, rerank = S.scaled_pq_budgets(e.count())
    rot = S.opq_rotation(e)  # cached per corpus (one covariance pass)
    er = S.opq_rotate(e)  # cached rotated frame (same R, same GEMM)
    cellmap = S.learned_cellmap(er, n_lists, 2)
    corpus_mem = er.join(cellmap, "vec_id")
    centroids = S.ivf_centroids_frame(
        corpus_mem, list_col="__ivf_cell"
    ).localCheckpoint(eager=True)
    codes = S.pq_encode(er)

    resolved = os.path.realpath(sf_dir.rstrip("/"))
    tag = (
        os.path.basename(resolved).replace(".", "_")
        + "_"
        + hashlib.md5(resolved.encode()).hexdigest()[:8]
    )
    path = f"{tempfile.gettempdir()}/sg_pqidx_{tag}_{os.getpid()}"
    S.save_pq_index(cellmap, centroids, codes, None, rot, path)
    l_cells, l_cent, l_codes, l_cbs, l_rot = S.load_pq_index(spark, path)
    # sever lineage from the on-disk artifact, then reclaim the dir
    # (the llm_ann_index_persistence discipline: no leaked artifact per
    # process/sf tier). The two N-row pieces (cells, codes) are joined
    # FIRST and checkpointed ONCE: one materialization pass over the
    # id-keyed state instead of two, and the loaded-search legs reuse
    # the pre-joined (vec_id, cell, codes) frame instead of re-running
    # the join per execution — the round-12 proof-volume trim.
    l_state = (
        l_cells.withColumnRenamed("cid", "__ivf_cell")
        .join(l_codes, "vec_id")
        .localCheckpoint(eager=True)
    )
    l_cent = l_cent.localCheckpoint(eager=True)
    shutil.rmtree(path, ignore_errors=True)
    if l_rot is None or len(l_cbs) != S.PQ_SUBSPACES:
        raise RuntimeError(
            "PQ index roundtrip lost artifact state: rotation "
            f"{'missing' if l_rot is None else 'ok'}, "
            f"{len(l_cbs)} codebooks"
        )

    # loaded-state search: corpus vectors re-rotated through the LOADED
    # R (the artifact stores routing/compression state, never vectors —
    # the corpus table remains the single source of vector truth)
    er_loaded = S.opq_apply(e, l_rot)
    corpus_loaded = er_loaded.join(l_state, "vec_id")
    # both searches feed multiple proof consumers (two exceptAll
    # directions each; the loaded search additionally feeds the recall
    # report) — persist the ~k·queries-row results so each multi-stage
    # ADC/rerank pipeline evaluates ONCE, not 2-3x inside the one
    # returned plan (the round-13 proof-volume trim)
    ann_loaded = S.ivf_pq_topk(
        er_loaded.where(F.col("vec_id") < 20),
        corpus_loaded,
        k=5,
        nprobe=nprobe,
        rerank=rerank,
        list_col="__ivf_cell",
        codebooks=l_cbs,
        codes_col="codes",
        centroids=l_cent,
    ).persist()
    ann_mem = S.ivf_pq_topk(
        er.where(F.col("vec_id") < 20),
        corpus_mem,
        k=5,
        nprobe=nprobe,
        rerank=rerank,
        list_col="__ivf_cell",
        centroids=centroids,
    ).persist()
    diff = (
        ann_loaded.exceptAll(ann_mem)
        .unionByName(ann_mem.exceptAll(ann_loaded))
        .agg(F.count(F.lit(1)).alias("__n_diff"))
    )
    return (
        _ann_recall_report(_exact_ground_truth(e), ann_loaded, floor=(4, 5))
        .crossJoin(F.broadcast(diff))
        .select(
            "n_queries",
            "n_exact",
            "truth_checksum",
            "recall_ok",
            (F.col("__n_diff") == 0).alias("loaded_matches_build"),
        )
    )


@query(
    "llm_semantic_dedup",
    tags=("L2", "L3", "U3"),
    oracle="""
    SELECT CAST(COUNT(*)
                + SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_planted,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           TRUE AS planted_all_dropped
    FROM embeddings
    """,
)
def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (operators/similarity.
    semantic_dedup): learned k-means cells bound the quadratic cosine pass
    to within-cell GEMMs (N^2 -> N^2/k), keep-first inside each cell.
    Planted-invariant form, like the MinHash/SimHash recall queries: every
    vec_id % 10 == 0 vector is cloned under a high id, and the oracle
    states a priori that (a) every clone is dropped — identical vectors
    provably share a cell (assignment is a deterministic function of the
    vector) and cosine exactly 1 >= 0.99 against a lower id — and
    (b) NOTHING ELSE is: the fixture's strongest organic pair sits far
    below the 0.99 threshold (max observed ~0.6), so n_kept equals the
    original corpus exactly. Engine-exact with zero float comparisons in
    the check."""
    e = load_table(spark, sf_dir, "embeddings")
    planted = e.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(PLANT_OFFSET)
    )
    out = S.semantic_dedup(e.unionByName(planted), threshold=0.99)
    # clones are identified by EXACT id membership (broadcast semi of the
    # planted id set), not by magnitude — `vec_id >= PLANT_OFFSET` breaks
    # on scaled tiers where real ids exceed the offset (the sf1 fixtures
    # stride ids by 1e9; see tools/gen_scaled_fixtures.py)
    out = out.join(
        F.broadcast(
            planted.select("vec_id").withColumn("__is_clone", F.lit(True))
        ),
        "vec_id",
        "left",
    )
    is_clone = F.coalesce(F.col("__is_clone"), F.lit(False))
    return out.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(is_clone.cast("long")).cast("bigint").alias("n_planted"),
        F.sum((~F.col("dropped")).cast("long")).cast("bigint").alias("n_kept"),
        (
            F.sum((is_clone & ~F.col("dropped")).cast("long")) == 0
        ).alias("planted_all_dropped"),
    )


@query(
    "llm_kmeans_large_k",
    tags=("L3",),
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS assigned_once,
           TRUE AS lists_bounded,
           TRUE AS inertia_monotone
    FROM embeddings
    """,
)
def llm_kmeans_large_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-k coarse-quantizer training: k=300 far exceeds
    _KMEANS_LITERAL_MAX_K, so assignment takes kmeans_train's
    Arrow-batched GEMM branch (one BLAS |x|^2 - 2 X.C^T + |c|^2 product
    per batch against the closure-shipped center matrix — shuffle-free,
    similarity.py) instead of the literal-centers projection — the code
    path a production nlist (thousands of cells) always uses, here
    exercised and oracled rather than left to unit scope. Invariant
    form: every vector assigned exactly once, cell ids bounded by k, and
    the inertia sequence non-increasing across 3 Lloyd's iterations
    (Lloyd's guarantee — holds regardless of float rounding)."""
    e = load_table(spark, sf_dir, "embeddings")
    assign, inertias = S.kmeans_train(e, k=300, iters=3)
    monotone = all(
        b <= a * (1 + 1e-9) + 1e-6 for a, b in zip(inertias, inertias[1:])
    )
    return assign.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        (F.count(F.lit(1)) == F.count_distinct("vec_id")).alias("assigned_once"),
        (
            (F.max("cid") < F.lit(300)) & (F.min("cid") >= F.lit(0))
        ).alias("lists_bounded"),
        F.lit(monotone).alias("inertia_monotone"),
    )


#: The exact-baseline fence (DESIGN.md "exact-baseline hazard pairs"),
#: enforced in code instead of prose: the two declared quadratic
#: baselines refuse to build above this corpus size unless the caller
#: states allow_quadratic=True. Sized just above the LARGEST committed
#: measurement tier that includes these queries (the sf3 ladder, 60k
#: embedding rows — SCALING.md's documented-superlinear legs stay
#: reproducible) and far below any real corpus; the sf10 ANN tier
#: (200k rows) deliberately excludes both queries. The scale paths are
#: the committed twins: llm_semantic_dedup (bucketed cells) and
#: llm_embedding_decontamination_pruned (IVF-pruned, exponent 0.12).
_QUADRATIC_MAX_ROWS = 100_000


def _fence_quadratic(e: DataFrame, name: str, allow_quadratic: bool) -> None:
    """Row-count probe (parquet metadata-scale) guarding a declared
    O(N^2)/O(N·M) exact baseline. Raising is the contract: these two
    plans exist to ORACLE their bucketed twins at fixture scale, and a
    scheduler that reaches for them on a real corpus should fail fast
    with the alternative named, not run for a week."""
    if allow_quadratic:
        return
    n = e.count()
    if n > _QUADRATIC_MAX_ROWS:
        raise RuntimeError(
            f"{name}: refusing to build the exact quadratic baseline over "
            f"{n} rows (> {_QUADRATIC_MAX_ROWS}). This plan is the "
            "declared fixture-scale oracle of its bucketed twin "
            "(llm_semantic_dedup / llm_embedding_decontamination_pruned) "
            "— use the twin at scale, or pass allow_quadratic=True to "
            "state the cost explicitly."
        )


@query(
    "llm_embedding_near_dup",
    tags=("L2", "L3"),
    oracle="""
    SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
           ROUND(list_cosine_similarity(
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) > 0.35
    """,
)
def llm_embedding_near_dup(
    spark: SparkSession, sf_dir: str, *, allow_quadratic: bool = False
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above threshold, computed as
    block-wise BLAS GEMM (operators/similarity.cosine_near_pairs) — the
    threshold is applied to the ROUNDED similarity on both sides so the
    cutoff is engine-exact. All-pairs BY DESIGN (the exact baseline of
    llm_semantic_dedup); fenced above _QUADRATIC_MAX_ROWS."""
    e = load_table(spark, sf_dir, "embeddings")
    _fence_quadratic(e, "llm_embedding_near_dup", allow_quadratic)
    return S.cosine_near_pairs(e, threshold=0.35)


# --------------------------------------------------------------------------
# L5 multimodal columns
# --------------------------------------------------------------------------


@query(
    "multimodal_media_metadata",
    tags=("L5", "F8"),
    oracle="""
    SELECT 'image/fake' AS mime,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(CAST(octet_length(encode(text)) % 640 AS INT)) AS max_width
    FROM documents
    """,
)
def multimodal_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-struct convention: binary payload + typed metadata, aggregated
    JVM-side (no Python) — the cheap scan-level stats path."""
    d = M.attach_media(load_table(spark, sf_dir, "documents"))
    return d.groupBy(F.col("media.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("media.meta.n_bytes").cast("bigint").alias("total_bytes"),
        F.max("media.meta.width").alias("max_width"),
    )


@query(
    "multimodal_decode_features",
    tags=("L5", "U3"),
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)        AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT)     AS width,
           CAST(octet_length(encode(text)) % 480 AS INT)     AS height,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, LEAST(octet_length(encode(text)), 64) + 1),
                   i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
               (a, b) -> a + b) % 1000000007 AS BIGINT)      AS checksum
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode over the media convention (the fake
    codec is deterministic, so even this Python path gets a full oracle —
    the comparison covers the batch plumbing end to end)."""
    d = M.attach_media(load_table(spark, sf_dir, "documents"))
    return M.decode_media(d)


@query(
    "multimodal_frame_sample",
    tags=("L5", "U3"),
    oracle="""
    WITH f AS (
        SELECT doc_id, k.k AS frame_id,
               substr(text, (k.k * len(text)) // 4 + 1,
                      ((k.k + 1) * len(text)) // 4 - (k.k * len(text)) // 4)
                   AS frame
        FROM documents, LATERAL (SELECT unnest(range(0, 4)) AS k) k
    )
    SELECT doc_id,
           CAST(frame_id AS INT)   AS frame_id,
           CAST(len(frame) AS BIGINT) AS n_bytes,
           md5(frame)              AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: every media payload expands to 4 frame
    rows inside one Arrow-batched mapInPandas (the 1->N batch shape a real
    ffmpeg extractor produces). The fake extractor is contiguous byte
    slicing + md5; the fixture text is ASCII, so the oracle reproduces the
    byte ranges with substr and the comparison covers the Python expansion
    path end to end."""
    d = M.attach_media(load_table(spark, sf_dir, "documents"))
    return M.sample_frames(d, n_frames=4)


@query(
    "multimodal_wav_decode",
    tags=("L5", "U3"),
    oracle="""
    WITH s AS (
        SELECT doc_id, unnest(range(0, 64 + doc_id % 37)) AS i
        FROM documents
    )
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MAX(ABS((doc_id * 31 + i * 17) % 2003 - 1001)) AS BIGINT) AS peak,
           CAST(SUM((doc_id * 31 + i * 17) % 2003 - 1001) AS BIGINT) AS sample_sum
    FROM s
    GROUP BY doc_id
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the oracle — the L5 tier that is NOT a
    fake: functions/multimodal.synth_wav writes one genuine RIFF/WAVE
    PCM16 file per document (stdlib ``wave`` writer, Arrow-batched,
    payloads born on the executors), and decode_wav parses the header
    and the FULL sample stream back with the stdlib codec. The waveform
    is a closed-form function of doc_id, so the oracle recomputes every
    decoded number — channel count and sample rate from the RIFF header,
    frame count, peak amplitude, exact integer sample sum — a priori in
    SQL. A wrong byte anywhere (header layout, endianness, int16
    packing, truncated frames) breaks the hash. Compressed formats stay
    behind the disclosed fake; this query is the proof the Spark-side
    media pipeline carries a real codec end to end when one exists in
    the environment."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.decode_wav(M.synth_wav(docs))


@query(
    "multimodal_wav_spectral",
    tags=("L5", "U3"),
    oracle="""
    SELECT doc_id,
           CAST(64 AS BIGINT)                       AS n_frames,
           CAST(33 AS BIGINT)                       AS n_bins,
           CAST(1 + doc_id % 24 AS BIGINT)          AS dominant_bin,
           CAST((1 + doc_id % 24) * 125 AS BIGINT)  AS dominant_hz,
           CAST(25 + doc_id % 6 AS BIGINT)          AS second_bin,
           CAST((25 + doc_id % 6) * 125 AS BIGINT)  AS second_hz
    FROM documents
    """,
)
def multimodal_wav_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frequency-domain audio features under the oracle: a genuine
    two-tone PCM16 WAV is synthesized per document (stdlib ``wave``
    writer on the executors), decoded back, and run through a true
    ``numpy.fft.rfft`` — the top-2 magnitude bins and their physical
    frequencies are the feature row. The tones sit at exact integer FFT
    bins (multimodal.TONE docstring: zero leakage, rounding noise four
    orders of magnitude under the tones), so argmax and second-argmax of
    the real spectrum are closed-form in doc_id and the SQL oracle pins
    a genuine FFT end to end. At 100 TB this is the audio-shard tagging
    pass: decode+FFT run where the bytes live inside one Arrow batch
    (vectorized — equal-length clips FFT as a single matrix call), and
    only the 7-column feature row ever shuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.spectral_features(M.synth_wav_tones(docs))


@query(
    "multimodal_bmp_decode",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM g
    ), pxy AS (
        SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px
    ), pxyc AS (
        SELECT doc_id, w, h, x, y, unnest(range(0, 3)) AS c FROM pxy
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(SUM((doc_id * 7 + y * 131 + x * 17 + c * 29) % 256) AS BIGINT)
               AS pixel_sum,
           CAST(SUM((y + 1) * (c + 1)
                    * ((doc_id * 7 + y * 131 + x * 17 + c * 29) % 256))
                AS BIGINT) AS weighted_sum
    FROM pxyc
    GROUP BY doc_id
    """,
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the oracle — the image twin of
    multimodal_wav_decode: synth_bmp writes one genuine uncompressed
    24-bit BMP per document (canonical 54-byte headers, bottom-up BGR
    rows, the format's 4-byte row padding — stdlib struct only) and
    decode_bmp parses headers + pixel array back with the real layout
    rules. The pixel formula is closed-form in doc_id, so the oracle
    recomputes width, height, the exact pixel sum, AND a layout-pinning
    checksum a priori: a plain sum is invariant under the two classic
    BMP misreads (channel swap, vertical flip), so the checksum weighs
    channels R,G,B as 1,2,3 (on-disk order is B,G,R) and image row y as
    (y+1) (file rows are bottom-up) — each misread, plus counting
    padding bytes, breaks the hash. The COMPRESSED image tier is
    multimodal_png_decode below; the DCT tier is multimodal_jpeg_decode
    — every multimodal tier now runs a real codec."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.decode_bmp(M.synth_bmp(docs))


@query(
    "multimodal_bmp_resize",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        FROM documents
    ), r AS (
        SELECT doc_id, w // 2 AS rw, h // 2 AS rh FROM g
    ), px AS (
        SELECT doc_id, rw, rh, unnest(range(0, rw)) AS X FROM r
    ), pxy AS (
        SELECT doc_id, rw, rh, X, unnest(range(0, rh)) AS Y FROM px
    ), pxyc AS (
        SELECT doc_id, rw, rh, X, Y, unnest(range(0, 3)) AS c FROM pxy
    ), pooled AS (
        SELECT doc_id, rw, rh, X, Y, c,
               (  (doc_id * 7 + (2*Y)   * 131 + (2*X)   * 17 + c * 29) % 256
                + (doc_id * 7 + (2*Y)   * 131 + (2*X+1) * 17 + c * 29) % 256
                + (doc_id * 7 + (2*Y+1) * 131 + (2*X)   * 17 + c * 29) % 256
                + (doc_id * 7 + (2*Y+1) * 131 + (2*X+1) * 17 + c * 29) % 256
               ) // 4 AS v
        FROM pxyc
    )
    SELECT doc_id,
           CAST(MIN(rw) AS BIGINT) AS width,
           CAST(MIN(rh) AS BIGINT) AS height,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           CAST(SUM((Y + 1) * (c + 1) * v) AS BIGINT) AS weighted_sum
    FROM pooled
    GROUP BY doc_id
    """,
)
def multimodal_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image RESIZE under the oracle — image in, image out, then the
    real decoder on the output: synth_bmp writes genuine 24-bit BMPs,
    functions/multimodal.resize_bmp parses each one with the format's
    actual layout rules, 2x2 box-filters it with INTEGER floor-means
    (exact arithmetic — no float resampling kernel whose rounding an
    oracle couldn't mirror; odd edge rows/columns drop, the no-padding
    pooling convention), and re-encodes a genuine BMP half the size;
    decode_bmp then parses THAT file and the oracle recomputes every
    resized dimension, the pooled pixel sum, and the layout-pinning
    (y+1)*(channel-weight) checksum a priori from the synth formula. A
    resize that mixes channels, mis-strides a box, re-encodes padding
    into the pixel sum, or flips the output rows breaks the hash. This
    is the downsample/thumbnail pass of a multimodal ingest pipeline:
    one narrow Arrow stage per image column, no shuffle, output strictly
    smaller than input."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.decode_bmp(M.resize_bmp(M.synth_bmp(docs), factor=2))


@query(
    "multimodal_png_decode",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM g
    ), pxy AS (
        SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px
    ), pxyc AS (
        SELECT doc_id, w, h, x, y, unnest(range(0, 3)) AS c FROM pxy
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(SUM((doc_id * 11 + y * 61 + x * 23 + c * 37) % 256) AS BIGINT)
               AS pixel_sum,
           CAST(SUM((y + 1) * (c + 1)
                    * ((doc_id * 11 + y * 61 + x * 23 + c * 37) % 256))
                AS BIGINT) AS weighted_sum
    FROM pxyc
    GROUP BY doc_id
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode under the oracle — the tier the BMP
    query's disclosure used to exclude: synth_png writes one genuine PNG
    per document (signature, IHDR, zlib-DEFLATE IDAT split across two
    chunks, IEND — every chunk with its real CRC32) whose scanlines are
    predictively FILTERED with all five PNG filter types cycling by row
    ((y + doc_id) % 5), and decode_png walks the chunk grammar verifying
    CRCs, concatenates IDAT, inflates, and RECONSTRUCTS each filter
    (Sub/Up/Average/Paeth per the spec) before summing pixels. Two real
    coding layers — prediction + DEFLATE — stand between the payload
    bytes and the pixel values, and the oracle recomputes the decoded
    sums a priori from the closed-form pixel formula: a decoder that
    skips filter reconstruction, drops an IDAT chunk, or mis-handles
    the row-0 boundary breaks the hash. Corrupt payloads (bad magic,
    CRC mismatch, truncated stream) yield no row, pytest-pinned. Only
    DCT formats (JPEG) remain behind the disclosed fake."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.decode_png(M.synth_png(docs))


@query(
    "multimodal_jpeg_decode",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
        FROM documents
    ), bx AS (
        SELECT doc_id, wb, hb, unnest(range(0, wb)) AS bx FROM g
    ), bxy AS (
        SELECT doc_id, wb, hb, bx, unnest(range(0, hb)) AS by FROM bx
    )
    SELECT doc_id,
           CAST(MIN(wb) * 8 AS BIGINT) AS width,
           CAST(MIN(hb) * 8 AS BIGINT) AS height,
           CAST(SUM(64 * ((doc_id * 19 + bx * 37 + by * 53) % 256)) AS BIGINT)
               AS pixel_sum,
           CAST(SUM((64 * bx + 36) * (64 * by + 36)
                    * ((doc_id * 19 + bx * 37 + by * 53) % 256)) AS BIGINT)
               AS weighted_sum
    FROM bxy
    GROUP BY doc_id
    """,
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DCT-image decode under the oracle — the last multimodal tier
    to go real, retiring the disclosed fake entirely: synth_jpeg writes
    one genuine baseline JPEG per document (SOI/JFIF/DQT/SOF0/DHT/SOS/
    EOI, the standard Annex K Huffman tables, forward DCT + quantization
    + zigzag + DC-diff entropy coding with 0xFF byte stuffing) and
    decode_jpeg runs the full inverse path — Huffman scan decode with
    byte unstuffing, the DC prediction chain, dequantize, inverse
    zigzag, full 2-D IDCT, level shift + clamp (functions/jpeg.py,
    stdlib+numpy). How a LOSSY codec sits under an exact hash oracle:
    images are constant per 8x8 block, so each block's DCT is DC-only
    and the quant table's DC divisor (8) exactly divides the DCT DC
    gain — quantize/dequantize/IDCT reconstructs bit-exactly while
    every coding layer stays real and load-bearing. The (y+1)*(x+1)
    weighted checksum pins MCU raster order and the DC-diff chain:
    per-block sums are separable, so the oracle recomputes it a priori
    as val * (64*bx+36) * (64*by+36). Corrupt payloads (truncated scan,
    bad Huffman bits, wrong markers) yield no row, pytest-pinned."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.decode_jpeg(M.synth_jpeg(docs))


@query(
    "multimodal_jpeg_tolerance_decode",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
        FROM documents
    ), bx AS (
        SELECT doc_id, wb, hb, unnest(range(0, wb)) AS bx FROM g
    ), bxy AS (
        SELECT doc_id, wb, hb, bx, unnest(range(0, hb)) AS by FROM bx
    )
    SELECT doc_id,
           CAST(MIN(wb) * 8 AS BIGINT) AS width,
           CAST(MIN(hb) * 8 AS BIGINT) AS height,
           CAST(SUM(64 * ((doc_id * 19 + bx * 37 + by * 53) % 200) + 1792)
                AS BIGINT) AS orig_pixel_sum,
           CAST(13 AS BIGINT) AS err_bound,
           TRUE AS within_bound
    FROM bxy
    GROUP BY doc_id
    """,
)
def multimodal_jpeg_tolerance_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOLERANCE oracle for LOSSY JPEG decode — the production-corpus
    regime multimodal_jpeg_decode's exact hash deliberately cannot cover
    (DESIGN.md "JPEG oracle boundary", now executable): synth_jpeg_ramp
    writes NON-block-constant images (per-block base + 3x+5y ramp, so
    every row-0/column-0 AC coefficient is live and quantization error
    is real), and decode_jpeg_tolerance runs the full inverse codec and
    gates per-pixel |decoded - original| against an A-PRIORI bound.

    The bound is a theorem, not a measurement: within-block-separable
    pixels put DCT support only on row 0 / column 0, quantization
    perturbs each surviving coefficient by <= q/2, and the IDCT is
    linear — maximizing the folded |basis| sums gives 13.44, +0.5
    decoder rounding, floored to the integer gate 13
    (jpeg.separable_ramp_err_bound; the decoder refuses to run if the
    literal drifts from the derivation, and the measured fixture-family
    max error is 4 — a 3x real margin). The oracle states width/height,
    the closed-form ORIGINAL pixel sum (64*base + 1792 per block), the
    bound literal, and within_bound TRUE, all a priori; a decoder that
    mis-scales the IDCT, drops an AC coefficient, or mis-walks the MCU
    raster pushes the error past the gate. Corrupt payloads yield no
    row; bound violations are containment-pytest-pinned
    (tests/test_llm_ops.py)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.decode_jpeg_tolerance(M.synth_jpeg_ramp(docs))


@query(
    "multimodal_gif_decode",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, 3 + doc_id % 7 AS w, 2 + doc_id % 5 AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM g
    ), pxy AS (
        SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px
    ), pxyc AS (
        SELECT doc_id, w, h, x, y, unnest(range(0, 3)) AS c,
               (doc_id * 13 + y * 37 + x * 7) % 256 AS idx
        FROM pxy
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(SUM((idx * (3 + 2 * c) + c) % 256) AS BIGINT) AS pixel_sum,
           CAST(SUM((y + 1) * (c + 1) * ((idx * (3 + 2 * c) + c) % 256))
                AS BIGINT) AS weighted_sum
    FROM pxyc
    GROUP BY doc_id
    """,
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL palette+LZW image decode — the pixel model no other tier
    covers (INDEXED color under a dictionary coder): synth_gif writes
    one genuine GIF89a per document (logical screen descriptor,
    256-entry global color table from the palette formula, the index
    raster LZW-compressed at variable 9->12-bit code width in proper
    data sub-blocks; every third doc's stream carries mid-stream CLEAR
    resets and every fourth a Graphic Control Extension) and decode_gif
    runs the full inverse path — signature, descriptor and color-table
    parse, extension skipping, sub-block reassembly, LZW decompression
    (KwKwK case, width-bump schedule, dictionary resets), palette
    lookup (functions/multimodal.py, stdlib only). The oracle recomputes
    width/height, the palette-mapped pixel sum, and the row/channel
    weighted checksum a priori from the synth formulas: a decoder that
    mis-schedules a width bump, drops a sub-block boundary, swaps
    palette channels, or mis-walks the raster breaks the hash. Corrupt
    payloads yield no row (containment pytest-pinned like the other
    codecs)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.decode_gif(M.synth_gif(docs))


@query(
    "multimodal_mp4_samples",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, unnest(range(0, 3 + doc_id % 3)) AS k
        FROM documents
    ), fr AS (
        SELECT doc_id, k, 12 + (doc_id + k) % 7 AS ln FROM g
    ), by_byte AS (
        SELECT doc_id, k, ln, unnest(range(0, ln)) AS j FROM fr
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS sample_id,
           CAST(MIN(ln) AS BIGINT) AS n_bytes,
           CAST(SUM((doc_id * 7 + k * 31 + j * 11) % 256) AS BIGINT)
               AS byte_sum,
           CAST(MIN(3 + doc_id % 3) AS BIGINT) AS header_samples
    FROM by_byte
    GROUP BY doc_id, k
    """,
)
def multimodal_mp4_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO BMFF (MP4) demux under the oracle — the second video
    container next to RIFF/AVI and a structurally different grammar:
    big-endian box tree with 64-bit largesize escapes (every even doc's
    mdat uses one), mdat-before-moov recorded-file layout, and sample
    extraction resolved through the REAL stbl sample table — a 2-entry
    stsc chunk map x per-sample stsz x absolute stco offsets
    (functions/multimodal.synth_mp4 / extract_mp4_samples, stdlib
    struct). The oracle recomputes every sample's length and byte sum a
    priori; a demuxer that assumes one chunk, skips the largesize, or
    walks the tree by fixed offsets breaks the hash. Corrupt payloads
    yield no rows (containment pytest-pinned)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.extract_mp4_samples(M.synth_mp4(docs))


@query(
    "multimodal_avi_frames",
    tags=("L5", "U3"),
    oracle="""
    WITH g AS (
        SELECT doc_id, unnest(range(0, 3 + doc_id % 3)) AS k
        FROM documents
    ), fr AS (
        SELECT doc_id, k, 16 + (doc_id + k) % 9 AS ln FROM g
    ), by_byte AS (
        SELECT doc_id, k, ln, unnest(range(0, ln)) AS j FROM fr
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS frame_id,
           CAST(MIN(ln) AS BIGINT) AS n_bytes,
           CAST(SUM((doc_id * 13 + k * 7 + j * 3) % 256) AS BIGINT) AS byte_sum,
           CAST(MIN(3 + doc_id % 3) AS BIGINT) AS header_frames
    FROM by_byte
    GROUP BY doc_id, k
    """,
)
def multimodal_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container frame extraction under the oracle — the third
    real decode tier (audio WAV, image BMP, now container AVI): synth_avi
    writes one structurally valid RIFF/AVI file per document (hdrl LIST
    with a truthful avih frame count + strl stream headers, movi LIST of
    raw '00db' frames; stdlib struct only) and extract_avi_frames walks
    the real RIFF chunk grammar back — nested LISTs, little-endian sizes,
    and the even-byte padding rule, which the deliberately odd frame
    lengths make load-bearing: a walker that skips the pad desyncs on
    the first odd frame and every subsequent fourcc misparses. One row
    per extracted frame with its exact byte sum plus the avih header's
    frame count, all recomputed a priori by the oracle from the
    closed-form frame formula. This is the real-container upgrade of
    multimodal_frame_sample's byte-slicing stand-in."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.extract_avi_frames(M.synth_avi(docs))


@query(
    "llm_hot_shingle_cap",
    tags=("L2", "A2"),
    oracle="""
    WITH posts AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> concat_ws(' ', string_split(text, ' ')[i],
                                       string_split(text, ' ')[i + 1],
                                       string_split(text, ' ')[i + 2]))))
                   AS shingle
        FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    df AS (SELECT shingle, COUNT(*) AS df FROM posts GROUP BY shingle)
    SELECT CAST(SUM(df) AS BIGINT) AS n_postings_kept,
           COUNT(*)                AS n_shingles_kept
    FROM df, n WHERE df * 100 <= n_docs
    """,
)
def llm_hot_shingle_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pins the hot-shingle document-frequency cap (operators/dedup.py
    df_capped_postings) — the safety valve that keeps an inverted-index
    near-dup join from degenerating to n^2 on boilerplate shingles — with
    an aggressive 1% threshold that actually drops shingles on the fixture
    corpus (the default 10% cap in llm_ngram_jaccard_pairs rarely fires
    there). The operator's surviving postings aggregate to kept-side
    totals the oracle reproduces from the identical integer-arithmetic
    cutoff (df * 100 <= n_docs): any off-by-one in the cap shifts both
    numbers and fails the hash. Single evaluation of the shingle subtree;
    the per-shingle regroup avoids a distinct-aggregate Expand."""
    d = load_table(spark, sf_dir, "documents")
    posts = D.shingle_postings(d)
    n_docs = d.agg(F.count(F.lit(1)).alias("__n"))
    capped = D.df_capped_postings(posts, max_df_num=1, max_df_den=100, n_docs=n_docs)
    return (
        capped.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .agg(
            F.sum("__df").cast("bigint").alias("n_postings_kept"),
            F.count(F.lit(1)).alias("n_shingles_kept"),
        )
    )


@query(
    "llm_unigram_logprob_scores",
    tags=("L4", "L12", "F3"),
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> len(t) > 0))
                   AS token
        FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM vocab)
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(-SUM(LN(CAST(c AS DOUBLE) / (SELECT n FROM tot)))
                     / COUNT(*), 2) AS nll_per_token
    FROM toks JOIN vocab USING (token)
    GROUP BY doc_id
    """,
)
def llm_unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring, unigram form: train a
    unigram LM on the corpus itself (token -> corpus frequency), then score
    every document by mean negative log-likelihood per token. Pretraining
    pipelines rank/filter crawl text exactly this way (CCNet buckets pages
    by KenLM perplexity into head/middle/tail); the unigram proxy keeps the
    whole computation in-engine and oracle-checkable.

    Scale shape: explode -> vocab aggregate (shuffle on token) -> postings
    x vocab equi-join on token (the vocab side is NOT broadcast: a crawl
    corpus's vocabulary is unbounded — misspellings, code, URLs) -> per-doc
    aggregate. The corpus token total rides a 1-row broadcast crossJoin,
    not a driver collect."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.length("token") > 0)
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").cast("double").alias("n"))
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("c").cast("double") / F.col("n")))
                / F.count(F.lit(1)),
                2,
            ).alias("nll_per_token"),
        )
    )


@query(
    "llm_tfidf_top_terms",
    tags=("L4", "W4", "F3"),
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> len(t) > 0))
                   AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf.tf * LN((SELECT n FROM nd) / CAST(df.df AS DOUBLE)), 4)
                   AS tfidf
        FROM tf JOIN df USING (token)
    )
    SELECT doc_id, token, tfidf, rank FROM (
        SELECT doc_id, token, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, token) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF — the
    inverted-index ranking primitive behind keyword extraction, topic
    labeling, and near-dup triage. Ranking happens on the ROUNDED score
    with a token tiebreak so it is engine-reproducible (same recipe as
    cosine_topk).

    Scale shape: two token-keyed aggregates (tf per (doc, token), df per
    token), an equi-join on token (df side not broadcast — unbounded crawl
    vocabulary), the corpus size as a 1-row broadcast, then the W4
    per-group top-k window partitioned by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.length("token") > 0)
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n") / F.col("df").cast("double")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", "rank")
    )


# --------------------------------------------------------------------------
# L3/L4 keyword retrieval: BM25 ranking (oracle-checked)
# --------------------------------------------------------------------------


@query(
    "llm_bm25_search",
    tags=("L3", "L4", "F5", "A1", "O2"),
    oracle="""
    WITH toks AS (
        SELECT doc_id, t.tok AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        WHERE t.tok <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS doclen FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(doclen) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token IN ('spark', 'merge', 'vector') GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
        WHERE token IN ('spark', 'merge', 'vector') GROUP BY token
    )
    SELECT tf.doc_id,
           ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                     * (tf * CAST(2.2 AS DOUBLE))
                       / (tf + CAST(1.2 AS DOUBLE)
                               * (0.25 + 0.75 * doclen / avgdl))), 6)
               AS bm25,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 20
    """,
)
def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75) over the corpus for a fixed
    3-term query, returning the top-20 documents — the lexical half of a
    retrieval stack next to the dense llm_cosine_topk/ANN path.

    Scale shape: the classic inverted-index build — two token-keyed
    aggregates (tf restricted to the query terms BEFORE aggregation, so the
    postings shuffle carries only matching tokens; df derived from the tf
    frame itself), the tiny per-term df and 1-row corpus stats broadcast onto
    the postings, and a TakeOrderedAndProject global top-k (per-partition
    heap, no full sort). Scores are rounded to 6 decimals in both engines
    BEFORE the rank cut, with doc_id as the tiebreak, so the top-20
    boundary never depends on float summation order.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = ["spark", "merge", "vector"]
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.length("token") > 0)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
    )
    qtoks = toks.where(F.col("token").isin(terms))
    tf = qtoks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf already has exactly one row per (doc, token), so document frequency
    # is a count over the tiny tf frame — counting from qtoks again would
    # re-run the corpus tokenize/explode subtree a third time
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("doclen") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(term_score), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# L2 entity-resolution near-dup: blocked edit distance (oracle-checked)
# --------------------------------------------------------------------------


@query(
    "dedup_blocked_edit_distance",
    tags=("L2", "F1", "J1", "A5"),
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name, p_brand,
               split_part(p_name, ' ', 2) AS noun
        FROM part
    )
    SELECT a.noun,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(SUM(CASE WHEN levenshtein(a.p_name, b.p_name) <= 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup_pairs,
           MIN(CASE WHEN levenshtein(a.p_name, b.p_name) <= 3
                    THEN levenshtein(a.p_name, b.p_name) END) AS min_dist,
           ROUND(AVG(levenshtein(a.p_name, b.p_name)), 6) AS avg_dist
    FROM p a JOIN p b
      ON a.noun = b.noun AND a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
    GROUP BY a.noun
    """,
)
def dedup_blocked_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution near-duplicate screen on part names: block on
    (noun token, brand), compare names within each block by Levenshtein
    edit distance, and report per-noun candidate volume vs near-duplicate
    hits (distance <= 3 catches adjective swaps like 'red bolt'/'hot
    bolt').

    Scale shape: the textbook ER blocking design — the O(n^2) comparison
    space is cut to same-(noun, brand) blocks via an equi self-join (shuffle
    hash on the composite block key; block sizes are bounded by the
    key-domain product, so no quadratic blowup), the distance predicate
    runs JVM-side (no Python), and the pair stream reduces directly to
    per-noun partial aggregates. Integer edit distances make the oracle
    comparison exact; the only float is an average of ints (exact
    long-sum / count in both engines).
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        # single-token names: getItem(1) is NULL but the oracle's
        # split_part(..., 2) is '' — coalesce so both engines block
        # short names together instead of Spark silently dropping them
        F.coalesce(F.split("p_name", " ").getItem(1), F.lit("")).alias("noun"),
    )
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    near = dist <= 3
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .groupBy(F.col("a.noun").alias("noun"))
        .agg(
            F.count(F.lit(1)).alias("n_candidate_pairs"),
            F.sum(near.cast("long")).alias("n_near_dup_pairs"),
            F.min(F.when(near, dist)).alias("min_dist"),
            F.round(F.avg(dist), 6).alias("avg_dist"),
        )
    )


# --------------------------------------------------------------------------
# L3 product quantization: PQ code assignment (oracle-checked)
# --------------------------------------------------------------------------

#: codebook shared with operators/similarity (PQ encode + IVF-PQ search) —
#: see PQ_CENTERS there for the design notes
_PQ_CENTERS = S.PQ_CENTERS

_PQ_CENTERS_SQL = ", ".join(
    "[" + ", ".join(f"{v}" for v in c) + "]" for c in _PQ_CENTERS
)


@query(
    "llm_pq_encode",
    tags=("L3", "F5", "A1"),
    oracle=f"""
    WITH sub AS (
        SELECT vec_id, m.m AS subspace,
               list_transform(embedding[m.m*16+1 : m.m*16+16],
                              x -> CAST(x AS DOUBLE)) AS sv
        FROM embeddings, (VALUES (0), (1), (2), (3)) AS m(m)
    ),
    d AS (
        SELECT vec_id, subspace,
               list_transform([{_PQ_CENTERS_SQL}],
                  c -> list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(list_zip(sv, c),
                             p -> (p[1] - p[2]) * (p[1] - p[2]))),
                       (a, b) -> a + b)) AS dists
        FROM sub
    )
    SELECT subspace,
           CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS code,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           -- per-row quantization to integer micro-units BEFORE the sum:
           -- a corpus-wide double sum is accumulation-order-sensitive and
           -- ROUND(.,6) of it can flip at a boundary between engines
           CAST(SUM(CAST(FLOOR(list_min(dists) * 1000000 + 0.5) AS BIGINT))
                AS BIGINT) AS total_err_micro
    FROM d GROUP BY subspace, code
    """,
)
def llm_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: split each 64-d embedding into 4
    16-d subvectors, assign each to the nearest of 4 codebook centers by
    squared L2 distance, and report per-(subspace, code) population and
    total quantization error — the compression step of an IVF-PQ index
    (llm_ivf_train_kmeans trains the coarse quantizer; this encodes the
    residual codes).

    Scale shape: entirely JVM-side — the subspace split is a posexplode of
    sliced arrays (4 rows per vector, no shuffle), the 4-way argmin is a
    higher-order transform/aggregate over broadcast-literal centers, and
    the only exchange is the final tiny (subspace, code) roll-up. At 100 TB
    the same plan streams: codes are computed scan-side and the shuffle
    carries 16 grouped partials per partition. The distance fold is written
    with the SAME operation order in both engines (cast-to-double, (x-y)*
    (x-y), left fold from 0), so per-row distances are bit-identical and
    the argmin/rounded-sum comparison is exact.
    """
    e = load_table(spark, sf_dir, "embeddings")
    # per-subspace distance arrays via the SHARED codebook machinery
    # (operators/similarity.pq_subspace_dists — the same expressions the
    # IVF-PQ search uses to assign codes)
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("subspace"),
                S.pq_subspace_dists(F.col("embedding"), m).alias("dists"),
            )
            for m in range(S.PQ_SUBSPACES)
        ]
    )
    ex = e.select(F.explode(subs).alias("s")).select(
        F.col("s.subspace").alias("subspace"), F.col("s.dists").alias("dists")
    )
    scored = ex.select(
        "subspace",
        (F.array_position(F.col("dists"), F.array_min("dists")) - 1)
        .cast("int")
        .alias("code"),
        F.array_min("dists").alias("err"),
    )
    return scored.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.floor(F.col("err") * 1_000_000 + 0.5).cast("long"))
        .cast("bigint")
        .alias("total_err_micro"),
    )


# --------------------------------------------------------------------------
# L9/L3 embedding-space decontamination + L2/L11 graph degrees + L10 audit
# --------------------------------------------------------------------------


@query(
    "llm_embedding_decontamination",
    tags=("L9", "L3", "J3", "A5"),
    oracle=f"""
    WITH bench AS (
        SELECT vec_id, embedding FROM embeddings WHERE label = 0
    ),
    corp AS (
        SELECT vec_id, label, embedding FROM embeddings WHERE label <> 0
    ),
    sims AS (
        SELECT c.vec_id, c.label,
               {cos_sim_sql("c.embedding", "b.embedding", 4)} AS sim
        FROM corp c CROSS JOIN bench b
    ),
    pv AS (
        SELECT vec_id, label, MAX(sim) AS max_sim FROM sims GROUP BY 1, 2
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN max_sim > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           ROUND(MAX(max_sim), 4) AS max_sim
    FROM pv GROUP BY label
    """,
)
def llm_embedding_decontamination(
    spark: SparkSession, sf_dir: str, *, allow_quadratic: bool = False
) -> DataFrame:
    """Embedding-space benchmark decontamination: treat label-0 vectors as
    the held-out benchmark set and flag corpus vectors whose cosine to ANY
    benchmark vector exceeds 0.3 — the dense-retrieval complement of the
    shingle-overlap check in llm_benchmark_overlap (paraphrased
    contamination has no shingle overlap but lands close in embedding
    space). Emits a per-label contamination summary.

    Scale shape: benchmark sets are bounded by construction (a few
    thousand eval docs), so the benchmark side BROADCASTS and the corpus
    side streams through one linear scan — corpus x benchmark work with
    corpus-only shuffle volume (the per-vector max folds into a partial
    aggregate keyed by vec_id, then a tiny per-label roll-up). Similarity
    is rounded to 4 decimals in both engines before the max/threshold so
    the flag never depends on last-ulp drift. The corpus x benchmark
    product is O(N·M) BY DESIGN (the exact baseline of
    llm_embedding_decontamination_pruned); fenced above
    _QUADRATIC_MAX_ROWS."""
    e = load_table(spark, sf_dir, "embeddings")
    _fence_quadratic(e, "llm_embedding_decontamination", allow_quadratic)
    return S.benchmark_decontamination(e, benchmark_label=0, threshold=0.3)


def llm_embedding_decontamination_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCALE-PATH decontamination (similarity.benchmark_decontamination_gemm:
    one float64 BLAS GEMM per Arrow batch against the closure-shipped
    benchmark matrix — 4.4x the fold variant at sf0.1, 23x at sf1) under
    a planted-contamination invariant: every third benchmark vector is
    cloned INTO the corpus under a reserved label, and a correct
    decontaminator MUST flag all of them at max_sim exactly 1.0 (identical
    normalized vectors; round-4 makes the 1.0 engine-exact). The
    bit-mirrorable fold variant (llm_embedding_decontamination) keeps the
    exact per-label oracle; this query pins the GEMM path with an oracle
    the engine cannot fake — planted recall plus the exact similarity
    ceiling."""
    e = load_table(spark, sf_dir, "embeddings")
    planted = (
        e.where((F.col("label") == 0) & (F.col("vec_id") % 3 == 0))
        .withColumn("vec_id", F.col("vec_id") + F.lit(PLANT_OFFSET))
        .withColumn("label", F.lit(99))
    )
    out = S.benchmark_decontamination_gemm(
        e.unionByName(planted), benchmark_label=0, threshold=0.3
    )
    return out.where(F.col("label") == 99).select(
        F.col("n_vectors").cast("bigint").alias("n_planted"),
        (F.col("n_contaminated") == F.col("n_vectors")).alias(
            "planted_all_flagged"
        ),
        F.col("max_sim"),
    )


query(
    "llm_embedding_decontamination_planted",
    tags=("L9", "L3"),
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           TRUE AS planted_all_flagged,
           CAST(1.0 AS DOUBLE) AS max_sim
    FROM embeddings WHERE label = 0 AND vec_id % 3 = 0
    """,
)(llm_embedding_decontamination_planted)


@query(
    "llm_embedding_decontamination_pruned",
    tags=("L9", "L3", "U2"),
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           TRUE AS planted_all_flagged,
           CAST(1.0 AS DOUBLE) AS max_sim
    FROM embeddings WHERE label = 0 AND vec_id % 3 = 0
    """,
)
def llm_embedding_decontamination_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF-CELL-PRUNED decontamination
    (similarity.benchmark_decontamination_pruned) under the same
    planted-contamination invariant as the GEMM twin: every third
    benchmark vector cloned into the corpus MUST be flagged at max_sim
    exactly 1.0. The invariant holds a priori for THIS index too — the
    probe set always contains the row's argmax cell, computed by the
    same arithmetic that assigned the benchmark, so an identical vector
    always scans the cell holding its twin. This is the scale path the
    exact twins baseline: per-corpus-row benchmark work is
    ~|B|*nprobe/n_lists + n_lists (sqrt budgets) instead of |B|, which
    is what retires the exact form's documented superlinear exponent on
    tiers that grow the benchmark side along with the corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    planted = (
        e.where((F.col("label") == 0) & (F.col("vec_id") % 3 == 0))
        .withColumn("vec_id", F.col("vec_id") + F.lit(PLANT_OFFSET))
        .withColumn("label", F.lit(99))
    )
    out = S.benchmark_decontamination_pruned(
        e.unionByName(planted), benchmark_label=0, threshold=0.3
    )
    return out.where(F.col("label") == 99).select(
        F.col("n_vectors").cast("bigint").alias("n_planted"),
        (F.col("n_contaminated") == F.col("n_vectors")).alias(
            "planted_all_flagged"
        ),
        F.col("max_sim"),
    )


@query(
    "llm_neardup_degree_histogram",
    tags=("L2", "L11", "A1", "F5"),
    oracle=f"""
    WITH e AS (
        SELECT unnest([doc_id_1, doc_id_2]) AS doc_id
        FROM ({NGRAM_JACCARD_SQL}) pairs
        WHERE jaccard >= 0.02
    ),
    deg AS (SELECT doc_id, COUNT(*) AS degree FROM e GROUP BY doc_id)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    """,
)
def llm_neardup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-duplicate graph (edges = exact
    3-gram Jaccard >= 0.02): how many documents have 1, 2, ... near-dup
    neighbors. The shape of this histogram is the standard health check
    before dedup clustering — a heavy tail means boilerplate-connected
    hub documents that would snowball clusters (cf. the DF cap and the
    hot-shingle guard).

    Scale shape: rides the shared DF-capped postings front end
    (sized_cold_postings — identical plan to llm_ngram_jaccard_pairs,
    whose self-join AQE folds to one materialized postings shuffle +
    ReusedExchange at runtime; see ngram_jaccard_pairs_df); endpoint
    expansion is one explode of the 2-element pair array (the pair
    subtree is evaluated ONCE — a union of two projections would
    duplicate it), and both aggregates reduce monotonically (pairs ->
    |docs| -> |distinct degrees|)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_df(spark, d)
    deg = (
        pairs.where(F.col("jaccard") >= 0.02)
        .select(
            F.explode(F.array(F.col("doc_id_1"), F.col("doc_id_2"))).alias(
                "doc_id"
            )
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "llm_audit_sample_per_source",
    tags=("L10", "W4", "F8"),
    oracle="""
    WITH r AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(concat('audit:', CAST(doc_id AS VARCHAR))),
                            doc_id) AS rk
        FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 2
    """,
)
def llm_audit_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic audit sample: exactly 2 documents per source, chosen
    by md5 rank — the reproducible "show me a few docs from every shard"
    query behind human eval and regression diffing. Unlike
    ``TABLESAMPLE``/``df.sample`` the selection is a pure function of the
    data (seeded by the key, not the partitioning), so re-runs, engine
    versions, and cluster sizes all agree on the sample.

    Scale shape: one hash-partitioned window per source with an early
    rank<=k cut (W4) — the output is k x |sources| rows regardless of
    corpus size; no global sort, no collect."""
    d = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.lit("audit:"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    return (
        d.select("source", "doc_id")
        .withColumn("rk", rk.cast("bigint"))
        .where(F.col("rk") <= 2)
    )


@query(
    "llm_filtered_cosine_topk",
    tags=("L3", "J1", "W4", "F5"),
    oracle=f"""
    WITH q AS (
        SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {cos_sim_sql("q.embedding", "c.embedding", 6)} AS sim
        FROM q JOIN embeddings c
          ON c.label = q.label AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS sim
    FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def llm_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: top-5 cosine neighbors for each
    query vector AMONG corpus vectors sharing the query's label — the
    "search within my collection/tenant" pattern every vector store needs.

    Scale shape: the metadata predicate is applied as the JOIN KEY, not a
    post-filter — filter-then-search: candidates are generated by an
    equi-join on label, so per-query work is the label partition's size,
    never the corpus (search-then-filter top-k is WRONG under filters: the
    global top-k may contain zero same-label rows). Shares
    operators/similarity.cosine_topk with the unfiltered baseline — same
    hoisted norms and the same rank-on-round-6/emit-round-4 discipline, so
    filtered and unfiltered results can never drift in ranking
    convention."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(
        e.where(F.col("vec_id") < 5),
        e,
        k=5,
        filter_col="label",
        broadcast_queries=True,
    )


@query(
    "llm_compression_ratio_filter",
    tags=("L12", "L14", "U3"),
    oracle="""
    WITH c AS (
        SELECT 'natural' AS doc_class,
               COUNT(*) AS n_docs, 0 AS n_flagged
        FROM documents
        UNION ALL
        SELECT 'planted_repetitive', COUNT(*), COUNT(*)
        FROM documents WHERE doc_id % 41 = 0
    )
    SELECT doc_class,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_flagged AS BIGINT) AS n_flagged
    FROM c
    """,
)
def llm_compression_ratio_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib-compression-ratio quality gate — the Dolma/RedPajama-style
    boilerplate screen that catches pathological repetition the n-gram
    repetition filter (llm_repetition_filter) measures lexically: a REAL
    ``zlib.compress`` (level 6, Arrow-batched mapInPandas — the stdlib
    codec IS the operator, like the multimodal tiers) runs over every
    document plus a PLANTED repetitive twin per doc_id % 41 == 0 (its
    first token repeated max(n_tokens, 64) times, id shifted by
    PLANT_OFFSET — the same id-space contract the MinHash/SimHash plants
    use, so scaled fixtures stay collision-free).

    Invariant-gated oracle with MEASURED margins (the HLL-sweep
    discipline): flagged = ratio < 0.25, and the fixture-wide gap is a
    priori wide — natural docs bottom out at ratio 0.382 (min across
    sf0.001/0.01/0.1; short docs go UP toward 1.0 because the zlib
    header dominates) while repeated-token plants top out at 0.102
    (>= 64 repeats forces the match-window regime), so the threshold
    sits >= 1.5x from both populations and every planted doc flags while
    no natural doc does — which is exactly what the oracle's closed-form
    counts state. At 100 TB the compute is one Arrow batch pass where
    the text lives; only (class, flag) pairs reach the 2-row aggregate."""
    import zlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    # the repeated token falls back to 'x' for NULL/empty text, so a
    # degenerate fixture row still yields a genuinely repetitive plant and
    # the oracle's n_flagged == n_docs claim cannot silently break
    rep_tok = F.when(
        F.length(F.coalesce(F.element_at(toks, 1), F.lit(""))) == 0, F.lit("x")
    ).otherwise(F.element_at(toks, 1))
    planted = d.where(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_repeat(rep_tok, F.greatest(F.size(toks), F.lit(64))),
        ).alias("text"),
        F.lit("planted_repetitive").alias("doc_class"),
    )
    staged = d.select(
        "doc_id", "text", F.lit("natural").alias("doc_class")
    ).unionByName(planted)

    def ratios(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ppm = []
            for t in pdf["text"]:
                raw = (t or "").encode("utf-8")
                if not raw:
                    ppm.append(1_000_000)  # empty: incompressible by fiat
                    continue
                ppm.append(len(zlib.compress(raw, 6)) * 1_000_000 // len(raw))
            yield pd.DataFrame(
                {"doc_class": pdf["doc_class"], "ratio_ppm": ppm}
            )

    scored = staged.mapInPandas(ratios, schema="doc_class string, ratio_ppm long")
    return scored.groupBy("doc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("ratio_ppm") < 250_000).cast("bigint"))
        .cast("bigint")
        .alias("n_flagged"),
    )


from ..functions.imagehash import IH_PLANT_OFFSET as _IH_PLANT_OFFSET
from ..functions.imagehash import IH_TWIN_MOD as _IH_TWIN_MOD


@query(
    "multimodal_dhash_near_dup",
    tags=("L5", "L2", "U3"),
    oracle=f"""
    SELECT doc_id AS a,
           CAST(doc_id + {_IH_PLANT_OFFSET} AS BIGINT) AS b
    FROM documents
    WHERE doc_id < 200 AND doc_id % {_IH_TWIN_MOD} = 0
    """,
)
def multimodal_dhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE dedup (functions/imagehash.py): every corpus image
    is canonicalized to a 9x8 exact-block-sum luminance grid whose 64
    horizontal gradient-sign bits form the dHash key; duplicates at
    DIFFERENT RESOLUTIONS collide on the key, so image dedup is one hash
    equi-join — the shuffle shape of exact text dedup, robust to the
    resize/re-encode a byte hash cannot see. Payloads are genuine 24-bit
    BMPs through the shared containment parser; every doc_id % 17 == 0
    gets a PLANTED 2x nearest-neighbor upscale twin, and the oracle's
    closed-form pair list is a THEOREM: pixel-replication multiplies
    every block sum by exactly 4, preserving all comparisons including
    ties (imagehash module docstring), while the xorshift-mixed pixel
    formula keeps the 200 natural images collision-free (0 measured;
    pinned with the planted-recall gate in tests/test_imagehash.py)."""
    from ..functions import imagehash as IH

    docs = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    hashed = IH.dhash_bmp(IH.synth_dhash_corpus(docs))
    return IH.dhash_duplicate_pairs(hashed)
