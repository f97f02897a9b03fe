"""Fixture-contract guards.

Round 3 lost 5 correctness rows, the bench, and the streaming tests to a
silent fixture regeneration that changed ``events.ts`` from parquet
TIMESTAMP(NANOS) to ``timestamp[us]`` (TIMESTAMP_NTZ in Spark 4). These
tests make the next drift cost minutes, not a round:

1. ``test_events_ts_shapes_normalize`` pins the loader against BOTH
   historical physical shapes by writing tiny temp parquets in each shape
   and asserting ``load_table`` yields TimestampType with identical values.
2. ``test_fixture_schemas_match_contract`` asserts every driver table's
   post-load Spark schema against the FIXTURES.md contract and fails with a
   message naming the drifted table/column.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from custom_python_etl_data_connector_rohitharumugams_spark.catalog import TABLES, load_table

from .conftest import SF_DIR

# Expected post-load dtypes (catalog.load_table output), per FIXTURES.md §A.
# `events.ts` is normalized to TimestampType regardless of physical shape.
CONTRACT: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

# o_orderdate / l_shipdate have shipped as timestamp[ms]; Spark reads ms/us
# parquet timestamps as plain `timestamp` OR `timestamp_ntz` depending on the
# writer's isAdjustedToUTC flag. Plans only compare/order these columns, so
# either reading is semantically identical under the UTC session pin — accept
# both rather than over-constraining the contract.
_TS_OK = {"timestamp", "timestamp_ntz"}


@pytest.mark.parametrize("table", TABLES)
def test_fixture_schemas_match_contract(spark, table):
    got = dict(load_table(spark, SF_DIR, table).dtypes)
    want = CONTRACT[table]
    assert set(got) == set(want), (
        f"fixture drift: table '{table}' columns changed — "
        f"missing={sorted(set(want) - set(got))} extra={sorted(set(got) - set(want))}"
    )
    for col, dtype in want.items():
        ok = got[col] in _TS_OK if dtype == "timestamp" else got[col] == dtype
        assert ok, (
            f"fixture drift: {table}.{col} is '{got[col]}', contract says '{dtype}' — "
            "a regeneration changed the physical type; fix catalog.load_table "
            "normalization, not the call sites"
        )
    if table == "events":
        # stricter: the loader must NORMALIZE ts to TimestampType, never NTZ
        assert got["ts"] == "timestamp", (
            f"events.ts loaded as '{got['ts']}' — catalog.load_table must "
            "normalize every physical shape to TimestampType"
        )


def _write_events(path: str, ts_array: pa.Array) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([10, 20, 30], pa.int64()),
                "event_type": pa.array(["click", "view", "purchase"]),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "props": pa.array(['{"k":1}', '{"k":2}', '{"k":3}']),
            }
        ),
        path,
    )


def test_events_ts_shapes_normalize(spark, tmp_path):
    """Both historical events.ts physical shapes load to identical
    TimestampType values: TIMESTAMP(NANOS) (pre-r3 fixtures) and
    timestamp[us] NTZ (r3 regeneration)."""
    base = datetime.datetime(2024, 1, 15, 12, 0, 0)
    stamps = [base + datetime.timedelta(seconds=i) for i in range(3)]
    nanos_dir = tmp_path / "nanos"
    micros_dir = tmp_path / "micros"
    nanos_dir.mkdir()
    micros_dir.mkdir()
    _write_events(
        str(nanos_dir / "events.parquet"),
        pa.array([int(s.timestamp() * 1e9) for s in stamps], pa.timestamp("ns")),
    )
    _write_events(
        str(micros_dir / "events.parquet"), pa.array(stamps, pa.timestamp("us"))
    )

    out = {}
    for name, d in (("nanos", nanos_dir), ("micros", micros_dir)):
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"{name}-shape events.ts loaded as {dict(df.dtypes)['ts']}"
        )
        out[name] = [r["ts"] for r in df.orderBy("event_id").select("ts").collect()]
    assert out["nanos"] == out["micros"] == stamps


def test_events_props_shape_pins_map_oracle_contract(spark):
    """scalar_map_event_totals' Spark side parses+explodes props while its
    oracle unconditionally extracts key 'k' — the two agree ONLY while
    every props value is exactly a single-key {"k": int} JSON object.
    This guard turns the next fixture drift (empty/NULL/multi-key props)
    into a named failure here instead of an opaque driver hash mismatch."""
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "events")
    parsed = e.select(
        F.col("props"),
        F.from_json("props", "map<string,bigint>").alias("m"),
    )
    bad = parsed.where(
        F.col("props").isNull()
        | F.col("m").isNull()
        | (F.map_keys("m") != F.array(F.lit("k")))
        | F.element_at("m", "k").isNull()
    )
    assert bad.count() == 0, bad.head(3)
