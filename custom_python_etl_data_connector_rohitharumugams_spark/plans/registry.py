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
# Round-10 window (recomposed twice this round: at round start against
# the nine committed CORRECTNESS files, then re-run at round end after
# the six round-10 registrations landed): 30 cover + 20 first-time = 50
# slots, zero deferred — the first-timers are the COMPLETE round-9
# post-freeze orphan backlog (the VERDICT round-9 item-2 list) PLUS
# every query registered this round (tar landing/roundtrip, streaming
# observe + histogram maintenance, routed join, null-safe join,
# exact-substring dedup). With
# this window, round 10 is the first round where every registered query
# can hold a committed driver CORRECTNESS row.
# tests/test_coverage.py asserts the backstop:
# every registered query is either already in a committed CORRECTNESS
# round or inside the current window's rotation plan, and that no window
# slot is wasted on a tag-redundant already-checked query while orphans
# wait. Evicted queries stay registered and pytest-parity-covered
# (tests/test_oracle_parity.py runs all of them under the driver's
# compare).
_PRIORITY: tuple[str, ...] = (
    "agg_hll_partition_merge",  # cover: A3 A1 F2
    "agg_rollup_pricing",  # cover: A4
    "analytics_daily_order_gapfill",  # cover: F5 F2 J2 F4
    "asof_next_purchase_within_2d",  # cover: J7 F2
    "connector_incremental_sync",  # cover: S1 S2 S3 S4 S7
    "connector_key_sanitization_report",  # cover: P3
    "dq_constraint_report",  # cover: P4 A5 F4 A2
    "join_range_price_bands",  # cover: J5 A1
    "llm_chunk_documents",  # cover: L6 F5
    "llm_corpus_build_e2e",  # cover: L1 L9 L12 L13 L10
    "llm_cosine_topk",  # cover: L3 J8 W4 F5
    "llm_langid_ngram",  # cover: L4 F1 A1 W4
    "llm_neardup_degree_histogram",  # cover: L2 L11 A1 F5
    "llm_pii_scrub",  # cover: L8 F1
    "llm_sequence_packing",  # cover: L7 W3
    "pricing_summary",  # cover: S5 P1 P2 A1 O1
    "scalar_map_event_totals",  # cover: F6 F7
    "setop_except_lapsed_customers",  # cover: O4
    "sql_waiting_suppliers",  # cover: J4 J1 A1 F2 O2
    "sql_window_distribution",  # cover: W1
    "stream_checkpoint_recovery",  # cover: T4 T1 S8 S9
    "stream_dedup_user_event_types",  # cover: T5 O5
    "stream_running_totals_update_log",  # cover: T6 W3
    "stream_session_windows",  # cover: T3 W2
    "stream_sliding_event_volume",  # cover: T2
    "stream_static_join_enrichment",  # cover: T7 J1
    "stream_stream_interval_join",  # cover: T8 J6
    "udaf_weighted_avg_price",  # cover: A7 U2
    "udf_scalar_name_clean",  # cover: U1
    "udtf_fixed_width_parse",  # cover: U4 P5
    "agg_cms_heavy_hitters",  # first-time: A1 F8 O2
    "agg_histogram_quantiles",  # first-time: A6 A1 W3
    "connector_npy_embedding_landing",  # first-time: S6 L5 U3
    "connector_tar_shard_landing",  # first-time: S6 L5 U3
    "connector_tar_shard_roundtrip",  # first-time: S7b L5 U3
    "connector_xml_landing",  # first-time: S6 P5
    "dq_join_skew_profile",  # first-time: A1 A6 O3
    "dq_observed_pipeline_metrics",  # first-time: P2 A1 F3
    "join_null_safe_event_buckets",  # first-time: J1 F4 A1
    "llm_compression_ratio_filter",  # first-time: L12 L14 U3
    "llm_exact_substring_dedup",  # first-time: L1 L2 A1
    "multimodal_dhash_near_dup",  # first-time: L5 L2 U3
    "multimodal_gif_decode",  # first-time: L5 U3
    "multimodal_mp4_samples",  # first-time: L5 U3
    "multimodal_npz_shards",  # first-time: L5 U3
    "multimodal_wav_spectral",  # first-time: L5 U3
    "skew_profile_routed_join",  # first-time: J1 J3 A1
    "stream_cms_maintenance",  # first-time: S8 S9 A1 F8
    "stream_histogram_quantile_maintenance",  # first-time: S8 S9 A6 A1
    "stream_observed_pipeline_metrics",  # first-time: S8 S9 P2 A1
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
