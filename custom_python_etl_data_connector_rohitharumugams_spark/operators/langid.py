"""N-gram language identification (SURVEY.md SS2 L4 — the classifier the
marker-ratio profile queries feed).

The standard n-gram language-ID design (Cavnar & Trenkle's classic
rank-profile method, reduced to its set-overlap core): build one character
trigram profile per language from labeled training text, score an unknown
document by its trigram overlap with each profile, and predict the argmax.

Scale shape (100 TB corpus):

- TRAINING is one distinct-aggregate over the labeled split — explode
  trigrams, ``distinct (lang, trigram)`` — a single shuffle whose output is
  VOCABULARY-bounded, not corpus-bounded (``top_k`` caps it hard when the
  vocabulary itself is large; full profiles are the provable-oracle
  configuration on the planted fixture).
- PREDICTION broadcasts the profile table (a classic small dim: languages x
  capped trigrams) onto the document trigram stream, aggregates match
  counts per (doc, lang), and takes the per-doc argmax with a W4 window —
  no shuffle touches the corpus twice, nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 26 consecutive code points per language, blocks disjoint by
#: construction — the planted "script" each language is transliterated
#: into (Latin Extended-A onward; all printable, all 1-code-unit).
_BLOCK_BASE = 0x100
_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def lang_blocks(langs: list[str]) -> dict[str, str]:
    """Deterministic disjoint 26-letter alphabet per language (sorted
    order, so the mapping is stable across runs and engines)."""
    return {
        lang: "".join(chr(_BLOCK_BASE + 26 * i + j) for j in range(26))
        for i, lang in enumerate(sorted(langs))
    }


def transliterate(text_col, lang_col, blocks: dict[str, str]):
    """Column expression: strip ``text_col`` to its a-z characters and map
    them into ``lang_col``'s block — the planted script-disjoint corpus.
    Documents of different languages then share ZERO alphabetic trigrams,
    which is what makes the classifier's held-out accuracy provable a
    priori rather than measured-and-hoped."""
    clean = F.regexp_replace(F.lower(text_col), "[^a-z]", "")
    expr = None
    for lang, block in blocks.items():
        mapped = F.translate(clean, _ALPHABET, block)
        expr = (
            F.when(lang_col == lang, mapped)
            if expr is None
            else expr.when(lang_col == lang, mapped)
        )
    return clean if expr is None else expr.otherwise(clean)


def char_trigrams(name: str):
    """All overlapping character trigrams of the named string column
    (empty array below length 3 — no sub-length grams ever leak into a
    profile)."""
    return F.expr(
        f"CASE WHEN length({name}) >= 3 THEN "
        f"transform(sequence(1, length({name}) - 2), i -> substring({name}, i, 3)) "
        f"ELSE array() END"
    )


def train_profiles(
    train: DataFrame,
    text_col: str = "__script",
    label_col: str = "lang",
    top_k: int | None = None,
) -> DataFrame:
    """(lang, trigram) profile table from the labeled training split.

    ``top_k=None`` keeps every observed trigram (the provable-oracle
    configuration: a held-out document's trigrams are then a subset of its
    own language's profile whenever its vocabulary appeared in training).
    A production corpus sets ``top_k`` to cap profile size by DOCUMENT
    FREQUENCY — the scale knob, traded against coverage of rare words."""
    grams = train.select(
        F.col(label_col).alias("lang"),
        F.explode(char_trigrams(text_col)).alias("trigram"),
    )
    if top_k is None:
        return grams.distinct()
    counted = grams.groupBy("lang", "trigram").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("lang").orderBy(F.col("__df").desc(), F.col("trigram"))
    return (
        counted.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= top_k)
        .select("lang", "trigram")
    )


def predict(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "__script",
) -> DataFrame:
    """(id, predicted lang, match count) per document: trigram overlap
    against the BROADCAST profile table, per-doc argmax (count desc, lang
    asc tiebreak — deterministic). Documents whose trigrams match no
    profile get no row; the caller decides whether that is an error."""
    grams = docs.select(
        F.col(id_col),
        F.explode(char_trigrams(text_col)).alias("trigram"),
    )
    scored = (
        grams.join(F.broadcast(profiles.withColumnRenamed("lang", "cand_lang")), "trigram")
        .groupBy(id_col, "cand_lang")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("matches").desc(), F.col("cand_lang")
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(id_col, F.col("cand_lang").alias("pred_lang"), "matches")
    )
