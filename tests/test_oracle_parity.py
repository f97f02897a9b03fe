"""Mirror of the driver's t2 correctness gate: every registered query with an
oracle must match DuckDB exactly at the driver's scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from custom_python_etl_data_connector_rohitharumugams_spark import plans

from .parity import assert_frames_match

QUERIES = plans.all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    qd = QUERIES[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(qd.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    qd = QUERIES[name]
    df = qd.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
