"""Named-query registry: the driver-checked operator surface.

Each SURVEY.md SS2 operator is declared as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a semantically
equivalent DuckDB oracle SQL string. The driver hash-compares the two at
sf0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded in BOTH dialects (doubles summed in different
  orders drift in the last ulp — rounding makes them bit-identical);
- timestamps are compared as DATE / epoch integers (engine-neutral).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY SS2 ids


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    _load_all()
    return dict(_REGISTRY)


def oracle_map() -> dict[str, str]:
    _load_all()
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}


def _load_all() -> None:
    """Import every query module (registration side effects). Imports are
    unconditional: a swallowed ImportError would silently drop whole query
    families from the driver's correctness run."""
    from . import (  # noqa: F401
        analytics,
        composed,
        connector_queries,
        llm,
        relational,
        scalar,
        sqlapi,
        stream_batch,
        udfs,
    )
