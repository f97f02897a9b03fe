"""Property-based spot checks (SURVEY.md SS5.2.4, hypothesis): operator
algebra that must hold on arbitrary frames, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from custom_python_etl_data_connector_rohitharumugams_spark.operators.dedup import exact_dedup

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # doc_id
        st.text(alphabet="ab ", min_size=0, max_size=12),  # text (collision-prone)
    ),
    min_size=0,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=rows_strategy)
@_SETTINGS
def test_exact_dedup_idempotent_and_text_unique(spark, rows):
    df = spark.createDataFrame(
        [(i, t) for i, t in rows] or [(0, "seed")], "doc_id long, text string"
    )
    once = exact_dedup(df)
    out = once.collect()
    # one row per distinct text, idempotent
    assert len(out) == df.select("text").distinct().count()
    assert exact_dedup(once).count() == len(out)


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=40
    )
)
@_SETTINGS
def test_window_sum_equals_groupby_sum(spark, vals):
    """The final running-window value per key == the groupBy sum."""
    from pyspark.sql import Window

    df = spark.createDataFrame(vals, "k int, v long").withColumn(
        "rid", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("k").orderBy("rid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running_last = (
        df.withColumn("run", F.sum("v").over(w))
        .groupBy("k")
        .agg(F.max_by("run", "rid").alias("final_run"))
    )
    direct = df.groupBy("k").agg(F.sum("v").alias("total"))
    joined = running_last.join(direct, "k").collect()
    assert all(r.final_run == r.total for r in joined)


@given(
    vals=st.lists(st.integers(-100, 100), min_size=0, max_size=30),
)
@_SETTINGS
def test_union_distinct_equals_set_union(spark, vals):
    half = len(vals) // 2
    a = spark.createDataFrame([(v,) for v in vals[:half]] or [(0,)], "v int")
    b = spark.createDataFrame([(v,) for v in vals[half:]] or [(0,)], "v int")
    got = sorted(r.v for r in a.union(b).distinct().collect())
    expect = sorted(
        set(vals[:half] or [0]) | set(vals[half:] or [0])
    )
    assert got == expect
