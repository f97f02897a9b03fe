"""Embedding-vector column builders (SURVEY.md L3): dot / norm / cosine over
``array<float>`` columns via higher-order functions — JVM-side, sequential
left-to-right accumulation in double precision (bit-reproducible, and
matching DuckDB's list-function evaluation order for oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
