"""Distributed frequent-items (heavy hitters) via mergeable Misra-Gries
summaries.

The sketch pass runs inside ``mapInPandas``: each partition is reduced to a
summary of at most ``c`` counters plus one sentinel row carrying the
partition's row count. Summaries are MERGEABLE (Agarwal, Cormode, Huang,
Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012): adding two summaries
counter-wise and then trimming to the ``c`` largest by subtracting the
(c+1)-th largest value preserves the Misra-Gries deficit bound, so the
per-batch ``value_counts`` (an exact summary) can be merged into the running
summary instead of replaying the stream item-by-item — the per-batch work is
a vectorized pandas count, not a Python loop over rows.

Guarantee used by the caller: the total undercount across a partition of
``n_p`` rows is at most ``n_p / (c + 1)``, so ANY key with true global
frequency ``> n / (c + 1)`` (and a fortiori ``> n / c``) retains a positive
counter in at least one partition summary and appears in the candidate
union. The exact recount pass then makes the final answer exact — the
sketch is a pure candidate pruner, never a source of approximation in the
emitted rows.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

#: sentinel key for the per-partition row-count row emitted alongside the
#: counter rows (lets one scan produce both the candidates and the total).
ROWS_SENTINEL = "\x00__rows__"


def mg_merge(counters: dict[str, int], batch_counts: dict[str, int], c: int) -> dict[str, int]:
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
    into a single <=(c+1)-row summary DataFrame (counter rows + sentinel
    row-count row). Null keys are not counted (``value_counts`` drops NaN);
    they still contribute to the sentinel row count, matching SQL GROUP BY
    semantics where a NULL group never reaches a HAVING count threshold."""
    import pandas as pd

    counters: dict[str, int] = {}
    n_rows = 0
    for pdf in batches:
        n_rows += len(pdf)
        counters = mg_merge(
            counters, {v: int(n) for v, n in pdf[column].value_counts().items()}, c
        )
    out = dict(counters)
    out[ROWS_SENTINEL] = n_rows
    yield pd.DataFrame({column: list(out), "est": list(out.values())})
