"""Distributed frequent-items (heavy hitters) via mergeable Misra-Gries
summaries.

The sketch pass runs inside ``mapInPandas``: each partition is reduced to a
summary of at most ``c`` counters plus one META row carrying the
partition's row count. Summaries are MERGEABLE (Agarwal, Cormode, Huang,
Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012): adding two summaries
counter-wise and then trimming to the ``c`` largest by subtracting the
(c+1)-th largest value preserves the Misra-Gries deficit bound, so the
per-batch ``value_counts`` (an exact summary) can be merged into the running
summary instead of replaying the stream item-by-item — the per-batch work is
a vectorized pandas count, not a Python loop over rows.

Summary shape: ``(key, est, is_meta)``. The row count travels in a row with
``is_meta=True`` and a NULL key — OUT OF BAND, never as a reserved key
value, so no data value can collide with it (the previous in-band
``"\\x00__rows__"`` sentinel both clobbered a real key equal to it and
forced the key column to be a string). NULL keys are counted like any other
key (``value_counts(dropna=False)``), matching SQL GROUP BY semantics where
NULL forms a group that CAN reach a HAVING threshold; the caller carries
null-candidacy through a dedicated flag because ``collect_set`` drops
NULLs.

Guarantee used by the caller: the total undercount across a partition of
``n_p`` rows is at most ``n_p / (c + 1)``, so ANY key with true global
frequency ``> n / (c + 1)`` (and a fortiori ``> n / c``) retains a positive
counter in at least one partition summary and appears in the candidate
union. The exact recount pass then makes the final answer exact — the
sketch is a pure candidate pruner, never a source of approximation in the
emitted rows.
"""

from __future__ import annotations

from collections.abc import Hashable, Iterable, Iterator


def mg_merge(
    counters: dict[Hashable, int], batch_counts: dict[Hashable, int], c: int
) -> dict[Hashable, int]:
    """Merge an exact batch count-dict into a running MG summary, trimming
    to at most ``c`` counters (mergeable-summaries trim)."""
    for v, n in batch_counts.items():
        counters[v] = counters.get(v, 0) + int(n)
    if len(counters) > c:
        kth = sorted(counters.values(), reverse=True)[c]
        counters = {v: n - kth for v, n in counters.items() if n - kth > 0}
    return counters


def mg_partition_summary(
    batches: Iterable["pd.DataFrame"], column: str, c: int
) -> Iterator["pd.DataFrame"]:  # noqa: F821 (pd imported lazily)
    """``mapInPandas`` generator: fold every Arrow batch of one partition
    into a single <=(c+1)-row summary DataFrame with columns
    ``(column, est, is_meta)`` — counter rows (``is_meta=False``; a NULL
    key row represents the NULL group) plus one row-count meta row
    (``is_meta=True``, NULL key). Works for any Arrow-compatible key type:
    keys pass through untouched, nothing is injected into the key space."""
    import pandas as pd

    counters: dict[Hashable, int] = {}
    n_rows = 0
    for pdf in batches:
        n_rows += len(pdf)
        # dropna=False: the NULL group is a real group (see module doc);
        # pandas reports it as NaN/None — normalize to None so merged
        # counters use one canonical null key
        vc = pdf[column].value_counts(dropna=False)
        counters = mg_merge(
            counters,
            {
                (None if pd.isna(v) else v): int(n)
                for v, n in vc.items()
            },
            c,
        )
    keys = list(counters) + [None]
    ests = list(counters.values()) + [n_rows]
    metas = [False] * len(counters) + [True]
    yield pd.DataFrame({column: keys, "est": ests, "is_meta": metas})
