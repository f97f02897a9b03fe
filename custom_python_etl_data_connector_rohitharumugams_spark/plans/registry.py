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
# Round-8 window (recomposed at round-8 start after CORRECTNESS_r07.json
# landed — the round-7 window's 15 tag-redundant already-checked slots
# were ejected by the optimizer's drop loop): 31 cover + 19 first-time.
# The 19 first-timers drain the 28-query orphan backlog down to 9; the
# deferred 9 (agg_approx_percentiles, dedup_exact_status_pairs,
# llm_ann_ivf_pq_hifi_topk, llm_ann_ivf_pq_topk, llm_ivf_train_kmeans,
# scalar_conditional_customer_report, scalar_date_order_report,
# scalar_id_generation, scalar_variant_event_payloads — plus every query
# registered after this window froze; the committed CORRECTNESS_r*.json
# union vs the registry is the authoritative list) ride round 9, the
# rotation program's stated completion round. Re-run
# tools/window_optimizer.py at round-9 start.
# tests/test_coverage.py asserts the backstop:
# every registered query is either already in a committed CORRECTNESS
# round or inside the current window's rotation plan, and that no window
# slot is wasted on a tag-redundant already-checked query while orphans
# wait. Evicted queries stay registered and pytest-parity-covered
# (tests/test_oracle_parity.py runs all of them under the driver's
# compare).
_PRIORITY: tuple[str, ...] = (
    # --- cover slots: minimal checked-query cover of the tags the ------
    # --- first-time cohort does not carry (exact, window_optimizer.py) --
    "agg_hll_partition_merge",            # A3 A1 F2
    "analytics_daily_order_gapfill",      # F5 F2 J2 F4
    "analytics_nation_trade_volume",      # J1 J3 A1 F2
    "analytics_rich_inactive_customers",  # J4 A1 A6
    "asof_next_purchase_within_2d",       # J7 F2
    "connector_incremental_sync",         # S1 S2 S3 S4 S7
    "connector_json_landing",             # S6 P4 P5
    "connector_key_sanitization_report",  # P3
    "connector_shardsink_manifest",       # S7b F8
    "join_cross_region_segment",          # J8 A1
    "join_range_price_bands",             # J5 A1
    "llm_boilerplate_ngrams",             # L12 L14 F5
    "llm_bpe_token_counts",               # L4 F1
    "llm_chunk_documents",                # L6 F5
    "llm_corpus_build_e2e",               # L1 L9 L12 L13 L10
    "llm_dedup_clusters",                 # L11 L2
    "llm_pii_scrub",                      # L8 F1
    "llm_sequence_packing",               # L7 W3
    "pricing_summary",                    # S5 P1 P2 A1 O1
    "scalar_map_event_totals",            # F6 F7
    "setop_except_lapsed_customers",      # O4
    "sql_window_distribution",            # W1
    "stream_checkpoint_recovery",         # T4 T1 S8 S9
    "stream_dedup_user_event_types",      # T5 O5
    "stream_running_totals_update_log",   # T6 W3
    "stream_session_windows",             # T3 W2
    "stream_sliding_event_volume",        # T2
    "stream_static_join_enrichment",      # T7 J1
    "udaf_weighted_avg_price",            # A7 U2
    "udf_scalar_name_clean",              # U1
    "udtf_fixed_width_parse",             # U4 P5
    # --- rotating slots: round-8 first-time cohort — never driver-checked
    # --- in r1-r7; the four multimodal codecs, the remaining ANN point,
    # --- and the stream-stream LEFT OUTER interval join are the evidence
    # --- the round-7 verdict named as thinnest --------------------------
    "agg_heavy_hitters_event_types",      # A1 U3
    "analytics_conversion_funnel",        # A1 A5 W2
    "analytics_event_type_transitions",   # W2 A1 F3
    "analytics_ols_price_by_size",        # A1 F3 A5
    "cdc_log_compaction_orders",          # W4 O5 O3
    "connector_gzip_landing",             # S6 P5
    "layout_bucketed_join_noshuffle",     # S5 J1 A1
    "layout_partitioned_prune",           # S5 P2 A1
    "llm_pq_encode",                      # L3 F5 A1
    "multimodal_avi_frames",              # L5 U3
    "multimodal_bmp_decode",              # L5 U3
    "multimodal_jpeg_decode",             # L5 U3
    "multimodal_png_decode",              # L5 U3
    "sort_top100_lineitems",              # O1 O2
    "sql_collect_set_statuses",           # A2 F5
    "sql_correlated_small_quantity_revenue",  # A1 J1
    "sql_cube_lineitem_volume",           # A4
    "sql_first_last_event_values",        # W2
    "stream_stream_left_outer_interval_join",  # T8 J6 F4
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
