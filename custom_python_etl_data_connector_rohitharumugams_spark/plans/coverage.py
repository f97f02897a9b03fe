"""SURVEY.md SS2 traceability: every operator id in the inventory maps to
the named queries that exercise it (via registry tags) and/or the pytest
suites that cover the non-query surface (sources, sinks, streaming
machinery). tests/test_coverage.py asserts the inventory has no gaps;
scripts-free generation of COVERAGE.md lives in tools/gen_coverage.py.
"""

from __future__ import annotations

from .registry import all_queries

#: the full SURVEY.md SS2 inventory
INVENTORY: dict[str, str] = {
    # 2.1 scans / sources / sinks
    "S1": "REST API source",
    "S2": "env-based auth/config",
    "S3": "pagination",
    "S4": "rate-limit / retry / backoff",
    "S5": "parquet scan",
    "S6": "JSON / CSV scan",
    "S7": "document-store sink",
    "S7b": "training-shard sink + manifest verify",
    "S8": "streaming source (event replay)",
    "S9": "streaming sinks",
    # 2.2 projection / filter
    "P1": "projection",
    "P2": "filter",
    "P3": "key sanitization",
    "P4": "null/empty-payload handling",
    "P5": "type normalization",
    # 2.3 joins
    "J1": "inner equi-join",
    "J2": "left/right/full outer join",
    "J3": "broadcast join",
    "J4": "semi / anti join",
    "J5": "theta / range join",
    "J6": "interval join",
    "J7": "as-of join",
    "J8": "cross join",
    # 2.4 aggregation
    "A1": "hash group-by aggregate",
    "A2": "distinct / count-distinct",
    "A3": "approx count-distinct",
    "A4": "grouping sets / rollup / cube",
    "A5": "filtered / conditional aggregate",
    "A6": "percentiles / stats",
    "A7": "UDAF",
    # 2.5 windows
    "W1": "ranking window functions",
    "W2": "analytic window functions",
    "W3": "framed aggregates",
    "W4": "per-group top-k",
    # 2.6 sorts / set ops
    "O1": "global sort",
    "O2": "limit / top-k",
    "O3": "union",
    "O4": "intersect / except",
    "O5": "exact dedup",
    # 2.7 scalar families
    "F1": "string functions",
    "F2": "date/time functions",
    "F3": "math functions",
    "F4": "conditional/null functions",
    "F5": "array functions",
    "F6": "map functions",
    "F7": "JSON functions",
    "F8": "hash functions",
    # 2.8 streaming
    "T1": "tumbling window agg",
    "T2": "sliding window agg",
    "T3": "session window agg",
    "T4": "watermark / late data",
    "T5": "streaming dedup",
    "T6": "arbitrary stateful op",
    "T7": "stream-static join",
    "T8": "stream-stream interval join",
    # 2.9 UDF surface
    "U1": "scalar Python UDF",
    "U2": "vectorized (pandas) UDF",
    "U3": "grouped-map applyInPandas",
    "U4": "Python UDTF",
    # 2.10 LLM-data extensions
    "L1": "exact text dedup",
    "L2": "near-dup detection",
    "L3": "similarity search",
    "L4": "text analysis",
    "L5": "multimodal columns",
    "L6": "document chunking",
    "L7": "sequence packing",
    "L8": "PII scrubbing",
    "L9": "benchmark decontamination",
    "L10": "stratified train/val split",
    "L11": "dedup clustering (connected components)",
    "L12": "quality filtering (Gopher/C4-style gate)",
    "L13": "domain mixture sampling",
    "L14": "repetition filtering (duplicated n-grams)",
}

#: operator ids whose primary coverage is the pytest suite (non-query
#: surface) — id -> (test file/behavior, implementation)
PYTEST_COVERAGE: dict[str, list[str]] = {
    "S1": ["tests/test_connector.py (fake-API extract)", "sources/restapi.py"],
    "S2": ["tests/test_connector.py::test_auth_header_from_env", "sources/envconf.py"],
    "S3": ["tests/test_connector.py::test_{cursor,offset}_pagination*", "sources/restapi.py"],
    "S4": [
        "tests/test_connector.py::test_rate_limit_backoff / test_bounded_retry_on_5xx",
        "sources/restapi.py",
    ],
    "S7": [
        "tests/test_connector.py::test_end_to_end_upsert_idempotent; "
        "tests/test_scale_patterns.py::test_streaming_foreachbatch_into_docsink",
        "sources/docsink.py",
    ],
    "S7b": [
        "tests/test_llm_pipeline.py::TestShardSink (roundtrip, manifest, "
        "tamper detection)",
        "sources/shardsink.py",
    ],
    "S8": ["tests/test_streaming.py (events_stream replay)", "streaming/replay.py"],
    "S9": ["tests/test_streaming.py (memory sink + foreachBatch)", "streaming/ops.py"],
    "P3": ["tests/test_connector.py::test_key_sanitization_nested", "functions/json_utils.py"],
    "P5": [
        "tests/test_connector.py (timestamp coercion in transform)",
        "functions/json_utils.py::coerce_timestamps",
    ],
    "T4": [
        "tests/test_streaming.py::test_watermark_drops_too_late_event",
        "streaming/ops.py (withWatermark)",
    ],
    "T5": ["tests/test_streaming.py::test_streaming_dedup_within_watermark", "streaming/ops.py"],
    "T6": ["tests/test_streaming.py::test_stateful_running_totals", "streaming/ops.py"],
    "L2": [
        "tests/test_llm_ops.py (planted-duplicate recall: minhash/simhash)",
        "operators/dedup.py",
    ],
    "L3": ["tests/test_llm_ops.py (LSH/IVF vs brute force)", "operators/similarity.py"],
    "L5": ["tests/test_oracle_parity.py (multimodal decode oracle)", "functions/multimodal.py"],
}


def coverage_table() -> dict[str, dict[str, list[str]]]:
    """id -> {"queries": [names], "tests": [descriptions]}."""
    out: dict[str, dict[str, list[str]]] = {
        op: {"queries": [], "tests": list(PYTEST_COVERAGE.get(op, []))[:1]}
        for op in INVENTORY
    }
    for name, qd in sorted(all_queries().items()):
        for tag in qd.tags:
            if tag in out:
                out[tag]["queries"].append(name)
    return out


def uncovered() -> list[str]:
    return [op for op, cov in coverage_table().items() if not cov["queries"] and not cov["tests"]]
