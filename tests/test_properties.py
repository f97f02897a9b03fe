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


@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=25
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(-99, 99)),
        min_size=0,
        max_size=25,
    ),
)
@_SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """SURVEY ranks as-of correctness under ties/duplicates as the #2 risk:
    arbitrary key/ts multisets (including ts ties on BOTH sides) must
    reproduce pandas merge_asof backward semantics, with the greatest
    tiebreak winning among simultaneous right rows."""
    import pandas as pd

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left_rows)], "k int, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(k, ts, v, i) for i, (k, ts, v) in enumerate(right_rows)]
        or [(99, 0, 0, 0)],  # empty right: key 99 never matches
        "k int, ts long, val long, rid long",
    )
    got = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  value_cols=["val"], tiebreak="rid")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values(["ts", "lid"]).reset_index(drop=True)
    rp = right.toPandas().sort_values(["ts", "rid"]).reset_index(drop=True)
    expect = pd.merge_asof(lp, rp[["k", "ts", "val"]], on="ts", by="k",
                           direction="backward", allow_exact_matches=True)
    expect = expect.sort_values("lid").reset_index(drop=True)
    a = [None if pd.isna(v) else int(v) for v in got["asof_val"]]
    b = [None if pd.isna(v) else int(v) for v in expect["val"]]
    assert a == b, f"asof mismatch: {list(zip(a, b))[:5]}"


@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=20),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(1, 8)),
        min_size=1,
        max_size=20,
    ),
)
@_SETTINGS
def test_interval_join_equals_naive_filter(spark, lefts, rights):
    """The equi-prefix + range-residual interval join (SMJ + filter) must
    equal the brute-force cross-product filter on arbitrary intervals."""
    l = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k int, t long, lid long"
    )
    r = spark.createDataFrame(
        [(k, s, s + w, i) for i, (k, s, w) in enumerate(rights)],
        "k int, lo long, hi long, rid long",
    )
    smart = l.join(r, (l.k == r.k) & (l.t >= r.lo) & (l.t < r.hi)).select("lid", "rid")
    naive = (
        l.crossJoin(r.withColumnRenamed("k", "k2"))
        .where((F.col("k") == F.col("k2")) & (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        .select("lid", "rid")
    )
    assert sorted(map(tuple, smart.collect())) == sorted(map(tuple, naive.collect()))


@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=25
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(-99, 99)),
        min_size=0,
        max_size=25,
    ),
    tolerance=st.one_of(st.none(), st.integers(0, 8)),
)
@_SETTINGS
def test_asof_forward_tolerance_matches_pandas(spark, left_rows, right_rows, tolerance):
    """Forward direction + tolerance must reproduce pandas merge_asof
    (direction='forward', tolerance=...). Among simultaneous right rows the
    greatest tiebreak wins, so the pandas right frame is pre-sorted
    (ts asc, rid desc) — merge_asof forward takes the first of a tie group."""
    import pandas as pd

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left_rows)], "k int, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(k, ts, v, i) for i, (k, ts, v) in enumerate(right_rows)]
        or [(99, 0, 0, 0)],
        "k int, ts long, val long, rid long",
    )
    got = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  value_cols=["val"], tiebreak="rid",
                  direction="forward",
                  tolerance_sec=tolerance)
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values(["ts", "lid"]).reset_index(drop=True)
    rp = (
        right.toPandas()
        .sort_values(["ts", "rid"], ascending=[True, False])
        .reset_index(drop=True)
    )
    kwargs = {} if tolerance is None else {"tolerance": tolerance}
    expect = pd.merge_asof(
        lp, rp[["k", "ts", "val"]], on="ts", by="k", direction="forward", **kwargs
    ).sort_values("lid").reset_index(drop=True)
    a = [None if pd.isna(v) else int(v) for v in got.sort_values("lid")["asof_val"]]
    b = [None if pd.isna(v) else int(v) for v in expect["val"]]
    assert a == b, f"asof forward mismatch: {list(zip(a, b))[:5]}"


def test_scd2_intervals_partition_each_users_timeline(spark):
    """SCD2 invariants on the fixture: per user, interval event counts sum
    to the user's event count; versions are consecutive from 1; adjacent
    intervals chain (valid_to == next valid_from) and never share a type."""
    import pandas as pd

    from custom_python_etl_data_connector_rohitharumugams_spark.plans.analytics import (
        scd2_user_event_intervals,
    )

    sf = "/root/testdata/sf0.001"
    iv = scd2_user_event_intervals(spark, sf).toPandas()
    ev = spark.read.parquet(f"{sf}/events.parquet").groupBy("user_id").count().toPandas()
    per_user = iv.groupby("user_id")["n_events"].sum().to_dict()
    for _, row in ev.iterrows():
        assert per_user[row["user_id"]] == row["count"], row["user_id"]
    for uid, g in iv.sort_values(["user_id", "version"]).groupby("user_id"):
        assert list(g["version"]) == list(range(1, len(g) + 1)), uid
        assert (g["valid_to_sec"].iloc[:-1].values == g["valid_from_sec"].iloc[1:].values).all(), uid
        assert pd.isna(g["valid_to_sec"].iloc[-1]), f"user {uid}: current state not open-ended"
        types = list(g["event_type"])
        assert all(a != b for a, b in zip(types, types[1:])), f"user {uid}: un-collapsed island"


def test_cdc_compaction_applies_updates_deletes_inserts(spark):
    """CDC invariants: %11 keys (deletes) absent, %13 negated keys
    (inserts) present with status N, surviving %7 keys updated to P,
    untouched keys keep their snapshot row."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans.analytics import (
        cdc_log_compaction_orders,
    )

    sf = "/root/testdata/sf0.001"
    out = cdc_log_compaction_orders(spark, sf).toPandas().set_index("o_orderkey")
    snap = spark.read.parquet(f"{sf}/orders.parquet").toPandas().set_index("o_orderkey")
    for k in snap.index:
        if k % 11 == 0:
            assert k not in out.index, f"tombstoned key {k} survived"
        elif k % 7 == 0:
            assert out.loc[k, "o_orderstatus"] == "P", f"update lost on {k}"
        else:
            assert out.loc[k, "o_orderstatus"] == snap.loc[k, "o_orderstatus"], k
        if k % 13 == 0:
            assert out.loc[-k - 1, "o_orderstatus"] == "N", f"insert lost on {k}"


def test_asof_null_valued_nearest_row_stays_null(spark):
    """merge_asof semantics: the NEAREST right row wins even when its value
    is NULL — carrying values per-column with last(ignorenulls) would skip
    it and attach an older row's value (and let the tolerance test use the
    wrong row's distance)."""
    import pandas as pd

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 0)], "k int, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 1, 5, 0), (1, 8, None, 1)], "k int, ts long, val long, rid long"
    )
    got = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["val"], tiebreak="rid",
    ).toPandas()
    assert pd.isna(got.asof_val.iloc[0]), (
        "nearest row (ts=8, val=NULL) must win over older non-null ts=1"
    )
    # tolerance measured against the NEAREST row: ts=8 is within 5 of 10,
    # so the (null) value is kept; the older row at distance 9 is never
    # consulted
    got_tol = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["val"], tiebreak="rid", tolerance_sec=5,
    ).toPandas()
    assert pd.isna(got_tol.asof_val.iloc[0])


def test_asof_rejects_output_name_collision(spark):
    import pytest as _pytest

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 7)], "k int, ts long, asof_val long")
    right = spark.createDataFrame([(1, 1, 5)], "k int, ts long, val long")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["val"])


@given(
    stream=st.lists(st.integers(0, 40), min_size=0, max_size=400),
    n_parts=st.integers(1, 4),
    c=st.integers(2, 10),
)
@_SETTINGS
def test_misra_gries_never_misses_a_heavy_hitter(stream, n_parts, c):
    """MG candidate-union guarantee (pure Python, no Spark): any key with
    global frequency > n/c survives in at least one partition summary —
    the invariant agg_heavy_hitters_event_types' exactness rests on."""
    from collections import Counter

    import pandas as pd

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.frequent import (
        mg_partition_summary,
    )

    keys = [str(v) for v in stream]
    parts = [keys[i::n_parts] for i in range(n_parts)]
    candidates: set[str] = set()
    total_from_meta = 0
    for part in parts:
        # feed each partition as two pandas batches (exercises the merge)
        half = len(part) // 2
        batches = [pd.DataFrame({"k": part[:half]}), pd.DataFrame({"k": part[half:]})]
        (summary,) = list(mg_partition_summary(iter(batches), "k", c))
        for _, row in summary.iterrows():
            if row["is_meta"]:
                total_from_meta += int(row["est"])
            else:
                candidates.add(row["k"])
        assert len(summary) <= c + 1
    assert total_from_meta == len(keys)
    n = len(keys)
    true_counts = Counter(keys)
    for k, freq in true_counts.items():
        if freq * c > n:
            assert k in candidates, (k, freq, n, c)


def test_misra_gries_null_group_and_hostile_keys():
    """The MG summary's meta row is OUT OF BAND: NULL keys form a real,
    candidate-eligible group (SQL GROUP BY semantics — the previous
    in-band sentinel silently dropped them), a data value equal to the old
    sentinel string is an ordinary key, and non-string key types pass
    through without string coercion."""
    import pandas as pd

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.frequent import (
        mg_partition_summary,
    )

    # 90 NULLs + 8 of a hostile literal + 2 others: NULL is the heavy key
    keys = [None] * 90 + ["\x00__rows__"] * 8 + ["a", "b"]
    (summary,) = list(
        mg_partition_summary(iter([pd.DataFrame({"k": keys})]), "k", 4)
    )
    meta = summary[summary["is_meta"]]
    cands = summary[~summary["is_meta"]]
    assert len(meta) == 1 and int(meta["est"].iloc[0]) == 100
    by_key = {k: int(v) for k, v in zip(cands["k"], cands["est"])}
    assert by_key.get(None) == 90  # the NULL group is a candidate
    assert by_key.get("\x00__rows__") == 8  # hostile literal uncorrupted

    # integer keys survive Arrow-compatible (no string sentinel mixed in)
    (isum,) = list(
        mg_partition_summary(
            iter([pd.DataFrame({"k": [7, 7, 7, 8]})]), "k", 4
        )
    )
    ints = isum[~isum["is_meta"]]
    assert {k: int(v) for k, v in zip(ints["k"], ints["est"])} == {7: 3, 8: 1}


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                    # group key (few keys: hot)
            st.one_of(st.none(), st.integers(0, 6)),  # low-card value + NULLs
        ),
        min_size=1,
        max_size=40,
    ),
    salt=st.integers(1, 7),
)
@_SETTINGS
def test_salted_count_distinct_equals_naive(spark, rows, salt):
    """Value-hash salting must reproduce exact count_distinct on ARBITRARY
    frames — including all-NULL groups, single-value groups, and salt
    counts that exceed the value cardinality (empty buckets sum as 0)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.skew import (
        salted_agg_count_distinct,
    )

    df = spark.createDataFrame(rows, "k int, v int")
    naive = {
        (r.k, r.n)
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    salted = {
        (r.k, r.n_distinct)
        for r in salted_agg_count_distinct(df, key="k", value="v", salt=salt).collect()
    }
    assert salted == naive


@given(
    n_vectors=st.integers(0, 10_000_000),
    n_lists=st.integers(1, 4096),
)
@_SETTINGS
def test_scaled_pq_budgets_invariants(n_vectors, n_lists):
    """Budget-rule algebra at any corpus size, BOTH paths. Flat-cell
    (explicit n_lists): nprobe within [1, n_lists], rerank >= k, rerank
    monotone in N (the constant-prune-fraction contract). Sqrt growth
    (default): n_lists ~ sqrt(N) at least k, nprobe ~ 4th root, and the
    expected candidate count nprobe * N / n_lists is SUB-linear — doubling
    the corpus must less-than-double the rerank cap (the per-query-cost
    contract the flat path cannot make)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.similarity import (
        scaled_pq_budgets,
    )

    nl, nprobe, rerank = scaled_pq_budgets(n_vectors, n_lists=n_lists)
    assert nl == n_lists
    assert 1 <= nprobe <= n_lists
    assert rerank >= 5
    _, _, rerank2 = scaled_pq_budgets(2 * n_vectors, n_lists=n_lists)
    assert rerank2 >= rerank  # monotone in corpus size

    import math

    nl_s, np_s, rr_s = scaled_pq_budgets(n_vectors)
    assert nl_s == max(5, math.ceil(math.sqrt(n_vectors)))
    assert 1 <= np_s <= nl_s and rr_s >= 5
    nl_d, np_d, rr_d = scaled_pq_budgets(2 * n_vectors)
    assert nl_d >= nl_s and np_d >= np_s  # index grows with the corpus
    if n_vectors >= 64:  # above the max(k)/max(4) floors
        assert rr_d <= 2 * rr_s  # sub-linear per-query exact stage


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),      # source id
            st.integers(0, 10_000), # doc id (dedup below)
            st.integers(1, 400),    # token count
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_budget_admission_is_exactly_a_rank_prefix(spark, rows):
    """Token-budget downsampling algebra (llm_token_budget_downsample):
    because cum_before is non-decreasing in rank order, the admitted set
    is EXACTLY a per-source prefix of the rank order — so (a) at least
    one doc per source is admitted, (b) if anything was rejected the
    admitted tokens already reached the budget, and (c) overshoot is
    bounded by the last admitted doc. Checked against a pure-python
    mirror of the rule on arbitrary frames."""
    from pyspark.sql import Window

    budget = 500
    uniq = {(s, d): t for s, d, t in rows}
    data = [(f"s{s}", d, t) for (s, d), t in uniq.items()]
    df = spark.createDataFrame(data, "source string, doc_id long, n_tokens long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("admitted", F.col("cum_before") < budget)
        .collect()
    )
    by_source: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.source, r.doc_id)):
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        flags = [r.admitted for r in rs]
        # prefix property: no admitted doc after a rejected one
        assert flags == sorted(flags, reverse=True), (src, flags)
        assert flags[0], f"{src}: first-ranked doc must always be admitted"
        admitted_tokens = sum(r.n_tokens for r in rs if r.admitted)
        if not all(flags):
            assert admitted_tokens >= budget
        # overshoot bounded by one document
        last = [r for r in rs if r.admitted][-1]
        assert admitted_tokens - last.n_tokens < budget


def test_compaction_plan_partitions_files_and_fills_bins(spark):
    """layout_compaction_plan invariants on the fixture: per source the
    bins are contiguous 0..max, every file lands in exactly one bin
    (byte/file totals preserved), every non-final bin's cumulative end
    crosses its target boundary (that is WHY the next bin opened), and
    fill_permille is exactly bin_bytes*1000 div target."""
    from custom_python_etl_data_connector_rohitharumugams_spark.catalog import load_table
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries
    from custom_python_etl_data_connector_rohitharumugams_spark.plans.advanced import (
        _COMPACT_TARGET_BYTES as T,
    )

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["layout_compaction_plan"].fn(spark, sf).collect()
    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    truth = {
        r.source: (r.n, r.total)
        for r in d.groupBy("source").agg(
            F.count("*").alias("n"),
            F.sum(F.octet_length("text").cast("bigint")).alias("total"),
        ).collect()
    }
    by_source: dict[str, list] = {}
    for r in rows:
        assert r.fill_permille == r.bin_bytes * 1000 // T
        by_source.setdefault(r.source, []).append(r)
    assert set(by_source) == set(truth)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.bin_id)
        assert [r.bin_id for r in rs] == list(range(len(rs))), src
        assert sum(r.n_files for r in rs) == truth[src][0]
        assert sum(r.bin_bytes for r in rs) == truth[src][1]
        cum = 0
        for r in rs[:-1]:
            cum += r.bin_bytes
            assert cum >= (r.bin_id + 1) * T, (
                f"{src} bin {r.bin_id} closed before reaching its target"
            )


def test_hll_merge_invariant_margins_hold_off_fixture(spark):
    """agg_hll_partition_merge's oracle bounds (2% vs exact, 1.5%
    merged-vs-direct) must hold AWAY from the fixture cardinality too —
    the sweep that killed the first-cut lgK=14 bounds (a 0.498% gap at
    15k keys on a 0.5% bound) rides here at its two worst measured
    points so a future lgK/bound edit re-faces the evidence."""
    from pyspark.sql import functions as F

    for n in (15_000, 150_000):
        df = spark.range(n).select((F.col("id") % 40).alias("m"), F.col("id").alias("k"))
        part = df.groupBy("m").agg(F.hll_sketch_agg("k", F.lit(16)).alias("sk"))
        merged = part.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
        ).collect()[0]["e"]
        direct = df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("k", F.lit(16))).alias("e")
        ).collect()[0]["e"]
        assert abs(merged - n) * 100 <= n * 2, (n, merged)
        assert abs(direct - n) * 100 <= n * 2, (n, direct)
        assert abs(merged - direct) * 1000 <= direct * 15, (n, merged, direct)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99_999_999),
            st.text(
                alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz#-",
                min_size=0,
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_fixed_width_render_parse_roundtrip(vals):
    """parse_fixed_width (the polymorphic UDTF's shared slicer) inverts the
    lpad/rpad renderer for every strip-stable value that fits its width —
    pure-Python property, no Spark session (the Spark-side encode leg and
    the analyze() schema are covered by the oracle-checked query)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.functions.fixedwidth import (
        parse_fixed_width,
    )

    spec = ",".join(
        part
        for i in range(len(vals))
        for part in (f"k{i}:10:bigint", f"s{i}:14:string")
    )
    line = "".join(f"{k:>10}" + f"{s:<14}" for k, s in vals)
    parsed = parse_fixed_width(line, spec)
    expect = tuple(x for k, s in vals for x in (k, s))
    assert parsed == expect


def _jpeg_scan_bounds(data: bytes) -> tuple[int, int]:
    """(scan_start, scan_end) byte offsets of the entropy-coded segment:
    after the SOS header, before the final EOI."""
    import struct

    pos = 2
    while pos + 4 <= len(data):
        marker = data[pos + 1]
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xDA:
            return pos + 2 + ln, data.rfind(b"\xFF\xD9")
        pos += 2 + ln
    raise AssertionError("no SOS in encoder output")


@given(
    seed=st.integers(0, 2**32 - 1),
    wb=st.integers(1, 3),
    hb=st.integers(1, 3),
    cut_at=st.floats(0.0, 1.0),
    cut_len=st.integers(1, 6),
)
@_SETTINGS
def test_jpeg_decoder_rejects_or_differs_on_hostile_streams(
    seed, wb, hb, cut_at, cut_len
):
    """Hostile-input contract of the baseline JPEG codec
    (functions/jpeg.py), pure-Python property over random images:

    - TRUNCATED SCAN (a slice cut out of the entropy stream, EOI kept):
      the decoder must raise or produce pixels that DIFFER from the
      intact decode — JPEG carries no checksum, so silent agreement is
      the only unacceptable outcome. Cuts inside the final 2 scan bytes
      are exempt: they can remove pure EOB padding, which a compliant
      decoder legitimately never reads.
    - DRI SEGMENT (restart intervals declared, scan carries no RSTn):
      must raise — skipping DRI would silently agree with streams a
      compliant decoder resyncs on; RSTn markers INSIDE the scan already
      raise via the bit reader's marker-in-scan check.
    - 16-BIT DQT (Pq=1): must raise — decoding Pq=1 payload bytes as
      8-bit entries would dequantize garbage without any error.
    """
    import random
    import struct

    from custom_python_etl_data_connector_rohitharumugams_spark.functions.jpeg import (
        decode_gray_jpeg,
        encode_gray_jpeg,
    )

    rng = random.Random(seed)
    w, h = wb * 8, hb * 8
    pixels = [rng.randrange(256) for _ in range(w * h)]
    data = encode_gray_jpeg(pixels, w, h)
    base = decode_gray_jpeg(data)
    s0, s1 = _jpeg_scan_bounds(data)
    assert s1 > s0 > 0

    # 1) truncated scan
    span = s1 - s0
    if span > cut_len + 2:
        at = s0 + int(cut_at * (span - cut_len - 2))
        cut = data[:at] + data[at + cut_len : ]
        try:
            got = decode_gray_jpeg(cut)
        except ValueError:
            got = None
        assert got is None or got != base, "truncated scan silently agreed"

    # 2) DRI declared, no restart markers in scan
    with_dri = (
        data[:2]
        + struct.pack(">HHH", 0xFFDD, 4, 4)  # DRI: interval 4 MCUs
        + data[2:]
    )
    try:
        decode_gray_jpeg(with_dri)
        raise AssertionError("DRI stream decoded without restart support")
    except ValueError:
        pass

    # 3) 16-bit quant table: rebuild the DQT segment with Pq=1
    dqt = data.find(b"\xFF\xDB")
    (dqt_len,) = struct.unpack_from(">H", data, dqt + 2)
    entries = data[dqt + 5 : dqt + 2 + dqt_len]  # 64 8-bit Qk
    wide = b"".join(struct.pack(">H", q) for q in entries)
    seg16 = struct.pack(">HH", 0xFFDB, len(wide) + 3) + b"\x01" + wide
    data16 = data[:dqt] + seg16 + data[dqt + 2 + dqt_len :]
    try:
        decode_gray_jpeg(data16)
        raise AssertionError("16-bit DQT decoded as 8-bit without error")
    except ValueError:
        pass


@given(
    left_pad=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=10),
    right_pad=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=10),
    left_pad2=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=10),
    right_pad2=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=10),
    run=st.lists(st.sampled_from("uvwxyz"), min_size=7, max_size=12),
)
@_SETTINGS
def test_winnowing_guarantee_shared_run_shares_a_fingerprint(
    spark, left_pad, right_pad, left_pad2, right_pad2, run
):
    """THE winnowing theorem (Schleimer et al. 2003), which no sketch
    matches: two documents sharing any token run of length >= k+window-1
    (here 4+4-1 = 7) MUST share at least one fingerprint value, no matter
    where the run sits in either document. MinHash only catches such a
    pair with probability ~ Jaccard; winnowing catches it always — this
    property is what the llm_winnowing_near_dup oracle's a-priori 100%
    planted recall stands on."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.dedup import (
        winnow_fingerprints,
    )

    doc1 = " ".join(left_pad + run + right_pad)
    doc2 = " ".join(left_pad2 + run + right_pad2)
    df = spark.createDataFrame([(1, doc1), (2, doc2)], "doc_id long, text string")
    posts = winnow_fingerprints(df, k=4, window=4)
    fps = {1: set(), 2: set()}
    for r in posts.collect():
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2], (doc1, doc2)
