"""Text-analysis column builders (SURVEY.md L4): tokenization, shingling,
quality scoring, fingerprinting. All pure Column expressions — JVM-side,
whole-stage-codegen, no UDFs — so they run at full scan speed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny in-vocabulary marker list used by the language/quality heuristics
#: (the fixture corpus is engine-vocab word soup; see FIXTURES.md).
MARKER_WORDS: tuple[str, ...] = ("table", "row", "value", "query", "join", "scan")

FP_MOD = 1_000_000_007
FP_BASE = 131


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def bpe_ish_tokens(text: Column | str) -> Column:
    r"""Regex token split approximating a BPE pre-tokenizer: word pieces,
    digit runs, or single non-space symbols. The whitespace class is
    spelled EXPLICITLY: Java's \s includes vertical tab, RE2's (DuckDB)
    does not, so the shorthand silently classifies VT differently across
    the two engines."""
    return F.regexp_extract_all(
        F.col(text) if isinstance(text, str) else text,
        F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r])"),
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """n-gram shingles as space-joined strings (Spark arrays are 0-indexed
    with ``arr[i]``; the DuckDB oracle's lists are 1-indexed).

    Documents shorter than ``n`` tokens yield an empty array — without the
    guard, sequence(0, size-n) would run DESCENDING into negative indices
    and element_at would throw under ANSI mode (Spark 4 default).
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def distinct_ratio(toks: Column) -> Column:
    """|distinct tokens| / |tokens| — vocabulary-diversity quality signal."""
    return F.size(F.array_distinct(toks)) / F.size(toks)


def marker_ratio(toks: Column, markers: tuple[str, ...] = MARKER_WORDS) -> Column:
    """Fraction of tokens that are known-vocabulary markers (language-ID /
    quality heuristic)."""
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))) / F.size(toks)


def avg_token_len(toks: Column) -> Column:
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")), F.lit(0.0), lambda a, x: a + x
    ) / F.size(toks)


def rolling_fingerprint(toks: Column) -> Column:
    """Polynomial rolling hash over token codes, mod a 31-bit prime — a
    document fingerprint computable identically in any engine with fold
    semantics (stays within int64 at every step)."""
    token_code = F.transform(toks, lambda t: (F.ascii(t) * 31 + F.length(t)).cast("bigint"))
    return F.aggregate(
        token_code, F.lit(0).cast("bigint"), lambda acc, x: (acc * FP_BASE + x) % FP_MOD
    )
