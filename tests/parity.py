"""Driver-style result comparison: row count + schema (column names) +
order-insensitive exact value equality.

Stricter than a tolerance check on purpose: the driver compares a value
hash, so any representation drift the oracle rounding fails to absorb must
be caught here, not in the driver run.
"""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _canon(v):
    """Canonicalize one cell to an engine-neutral comparable value.

    Numeric values are TYPE-TAGGED: ints become ("i", v) and floats
    ("f", v), so 123 (Spark bigint) never compares equal to 123.0 (what
    pandas makes of a DuckDB HUGEINT). The driver's value hash serializes
    ints and floats differently, so the mirror must too — Python's
    `123 == 123.0` equality masked exactly this drift in round 2
    (llm_sequence_packing / llm_pii_scrub / llm_stratified_split)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0:
            return ("f", 0.0)  # collapse -0.0 / +0.0
        return ("f", v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    if isinstance(v, (int,)):
        return ("i", int(v))
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return ("i", int(v))
        if isinstance(v, np.floating):
            return _canon(float(v))
        if isinstance(v, np.bool_):
            return ("b", bool(v))
    except ImportError:
        pass
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = _normalize(spark_pdf)
    o_rows = _normalize(oracle_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} row mismatches; first 5: "
        + "\n".join(f"  spark={a}\n  oracle={b}" for _, a, b in mismatches[:5])
    )
