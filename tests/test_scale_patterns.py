"""Scale-pattern evidence tests (DESIGN.md claims, checked against real
plans): bucketed co-located joins eliminate the join shuffle; salting is
result-invariant; streaming lands into the doc sink via foreachBatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_rohitharumugams_spark.catalog import load_table
from custom_python_etl_data_connector_rohitharumugams_spark.operators.skew import (
    salted_join,
)
from custom_python_etl_data_connector_rohitharumugams_spark.sources import docsink

SF = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-bucketed tables on the join key => SortMergeJoin with ZERO
    Exchange operators (the 100 TB fact-fact join strategy in DESIGN.md)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators import bucketing

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{tmp_path}/wh'")
    try:
        orders = load_table(spark, SF, "orders")
        lineitem = load_table(spark, SF, "lineitem")
        bucketing.write_bucketed(orders, "bucketdemo.orders_b", "o_orderkey", n_buckets=8)
        bucketing.write_bucketed(lineitem, "bucketdemo.lineitem_b", "l_orderkey", n_buckets=8)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                bucketing.bucketed_join(
                    spark,
                    "bucketdemo.lineitem_b",
                    "bucketdemo.orders_b",
                    "l_orderkey",
                    "o_orderkey",
                )
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            plan = _physical_plan(joined)
            assert "SortMergeJoin" in plan
            # the only exchange allowed is the final tiny aggregate shuffle;
            # the join itself must read co-located buckets directly
            join_part = plan.split("SortMergeJoin", 1)[1]
            assert "Exchange" not in join_part, f"join side shuffled:\n{join_part[:800]}"
            # results still correct
            direct = (
                lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, direct.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """The 100 TB layout claim (DESIGN.md): date-partitioned tables serve
    year-filtered queries by reading ONLY matching partitions — asserted via
    PartitionFilters in the physical plan and partition count on disk."""
    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("order_year").parquet(path)

    df = spark.read.parquet(path).where(F.col("order_year") == 1996)
    plan = _physical_plan(df)
    assert "PartitionFilters" in plan and "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    import glob

    years = len(glob.glob(f"{path}/order_year=*"))
    assert years >= 5  # multiple partitions exist...
    expected = orders.where(F.col("order_year") == 1996).count()
    assert df.count() == expected  # ...and the filtered read is correct


def test_salted_join_matches_plain_join(spark):
    e = load_table(spark, SF, "events").select((F.col("user_id") % 3).alias("k"), "event_id")
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k bigint, lab string")
    salted = salted_join(e, dim, on="k", salt=8).select("event_id", "lab")
    plain = e.join(dim, "k").select("event_id", "lab")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_streaming_foreachbatch_into_docsink(spark, tmp_path):
    """Stream -> foreachBatch -> document collection: the streaming side of
    the reference's load contract (collection + ingested_at)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.streaming.replay import (
        events_stream,
        split_events_for_replay,
    )

    replay = split_events_for_replay(
        spark, SF, str(tmp_path / "events_replay"), n_slices=2
    )
    sdf = events_stream(spark, replay, max_files_per_trigger=1)

    def land(batch_df, batch_id: int):
        docsink.write_collection(
            batch_df, str(tmp_path / "sink"), "events_raw", key_col="event_id", mode="upsert"
        )

    q = (
        sdf.writeStream.foreachBatch(land)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = docsink.read_collection(spark, str(tmp_path / "sink"), "events_raw")
    assert landed.count() == load_table(spark, SF, "events").count()
    assert "ingested_at" in landed.columns


def test_cosine_near_pairs_never_collects_corpus(spark, monkeypatch):
    """The tiled block-GEMM near-dup must be fully distributed: a corpus too
    big for any single node still runs. Asserted by making every driver-side
    materialization path (collect / toLocalIterator / broadcast) explode —
    the operator must build, shuffle, and reduce entirely on executors."""
    import pyspark.sql

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.similarity import (
        cosine_near_pairs,
    )

    emb = load_table(spark, SF, "embeddings")
    expected = cosine_near_pairs(emb, threshold=0.35).count()

    def boom(*a, **kw):
        raise AssertionError("driver-side corpus materialization")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", boom)
    monkeypatch.setattr(pyspark.sql.DataFrame, "toLocalIterator", boom)
    monkeypatch.setattr(spark.sparkContext, "broadcast", boom)
    got = cosine_near_pairs(emb, threshold=0.35, n_blocks=3)
    assert got.count() == expected and expected > 0


def test_cosine_near_pairs_block_count_invariant(spark):
    """Tiling is an execution detail: every n_blocks must return the exact
    same pair set (each unordered id pair lives in exactly one tile)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.similarity import (
        cosine_near_pairs,
    )

    emb = load_table(spark, SF, "embeddings")
    base = sorted(map(tuple, cosine_near_pairs(emb, 0.35, n_blocks=1).collect()))
    for nb in (2, 5):
        got = sorted(map(tuple, cosine_near_pairs(emb, 0.35, n_blocks=nb).collect()))
        assert got == base


def test_orc_roundtrip_preserves_table(spark, tmp_path):
    """S6 breadth: ORC is a first-class landing format alongside
    parquet/JSON/CSV — write the customer dim as ORC, read it back, and
    the frame is byte-identical (schema + every row)."""
    c = load_table(spark, SF, "customer")
    path = str(tmp_path / "customer_orc")
    c.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == c.schema
    assert back.exceptAll(c).count() == 0 and c.exceptAll(back).count() == 0


def test_bucketed_join_same_key_name_single_column(spark, tmp_path):
    """Co-bucketed tables sharing the key NAME must join to one coalesced
    key column (name-list join) — not two ambiguous ones."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators import bucketing

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bd2 LOCATION '{tmp_path}/wh2'")
    try:
        e = load_table(spark, SF, "events").select("user_id", "value")
        bucketing.write_bucketed(e, "bd2.a_b", "user_id", n_buckets=4)
        bucketing.write_bucketed(e, "bd2.b_b", "user_id", n_buckets=4)
        j = bucketing.bucketed_join(spark, "bd2.a_b", "bd2.b_b", "user_id", "user_id")
        assert j.columns.count("user_id") == 1
        j.select("user_id").limit(1).collect()  # would raise on ambiguity
    finally:
        spark.sql("DROP DATABASE IF EXISTS bd2 CASCADE")


def test_no_python_in_unexpected_query_plans(spark):
    """Global 'stay JVM-side' guardrail: compiling every registered query,
    only operators whose POINT is the Python mechanism (UDF surface,
    Arrow-batched GEMM/decode) may contain Python evaluation nodes —
    a Python node sneaking into any other plan is a 10-100x scan-speed
    regression at 100 TB and fails here before it ships."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    PYTHON_IS_THE_OPERATOR = {
        "udf_scalar_name_clean", "udaf_weighted_avg_price", "udf_grouped_zscore",
        "udf_grouped_zscore_stats_join",         # U3 scale twin: the Arrow
                                                 # batch path IS the point
        "udtf_tokenize_part_names",              # U1-U4: the UDF mechanism itself
        "udtf_fixed_width_parse",                # U4: polymorphic UDTF IS the op
        "multimodal_decode_features", "multimodal_frame_sample",  # Arrow decode
        "multimodal_wav_decode", "multimodal_bmp_decode",   # real codecs:
        "multimodal_avi_frames", "multimodal_png_decode",   # Arrow-batched
        "multimodal_bmp_resize",                            # parse+pool+
                                                            # re-encode is
                                                            # the operator
        "multimodal_gif_decode",                            # palette+LZW
        "connector_binaryfile_media_landing",               # binaryFile ->
                                                            # real GIF decode
        "multimodal_mp4_samples",                           # BMFF box walk
        "multimodal_wav_spectral",               # decode + numpy rfft in the
                                                 # Arrow batch IS the operator
        "connector_npy_embedding_landing",       # binaryFile -> NPY header
                                                 # parse over mapInArrow
        "multimodal_npz_shards",                 # zip walk + NPY parse over
                                                 # mapInArrow
        "connector_tar_shard_landing",           # binaryFile -> stdlib tar
                                                 # walk: the WebDataset
                                                 # member decode IS the op
        "connector_tar_shard_roundtrip",         # + the applyInPandas tar
                                                 # WRITE side (one archive
                                                 # per shard group)
        "llm_compression_ratio_filter",          # stdlib zlib codec in the
                                                 # Arrow batch IS the operator
        "multimodal_dhash_near_dup",             # BMP parse + block-sum dHash
                                                 # in the Arrow batch
        "llm_bpe_train",                         # per-word merge rewrite is
                                                 # sequential by definition
        "llm_bpe_tokenize_corpus",               # + the corpus apply pass
        "multimodal_jpeg_decode",                           # byte parsing +
                                                 # RIFF/BMP byte parsing IS
                                                 # the operator (L5 tier)
        "multimodal_jpeg_tolerance_decode",      # same codec, lossy ramp
                                                 # family + a-priori error gate
        "llm_ann_lsh_topk",                      # mapInPandas hyperplane GEMM
        "llm_kmeans_large_k",                    # mapInPandas assignment GEMM
                                                 # (the large-k branch IS the
                                                 # Arrow-vectorized operator)
        # every learned-quantizer query: kmeans assignment is the Arrow
        # GEMM branch for k > _KMEANS_LITERAL_MAX_K (= 8; measured faster
        # than the literal fold at every production k), so the trained
        # cell map's plan legitimately carries one narrow MapInPandas
        "llm_ann_ivf_learned_topk", "llm_ann_ivf_pq_learned_topk",
        "llm_ann_ivf_pq_hifi_topk", "llm_ann_ivf_pq_scaled_topk",
        "llm_ivf_train_kmeans",
        "llm_ann_frozen_add_topk",               # + the frozen add()
                                                 # assignment pass itself
        "llm_frozen_index_drift_trigger",        # + the same frozen assign
                                                 # (GEMM) feeding the monitor
        "llm_ann_frozen_delete_topk",            # + the frozen assign under
                                                 # the tombstone mask
        "llm_ann_index_compaction",              # + frozen assigns on both
                                                 # sides of the compaction
                                                 # equivalence proof
        "stream_ann_index_maintenance",          # + frozen assigns in the
                                                 # maintained/batch-twin
                                                 # equivalence proof
        "stream_ann_index_compaction",           # + frozen assigns on both
                                                 # sides of the post-compact
                                                 # equivalence proof
        "llm_ann_ivf_pq_opq_topk",               # + the OPQ rotation apply
                                                 # (Arrow GEMM) by design
        "llm_ann_pq_index_persistence",          # + the loaded-R rotation
                                                 # apply on both proof legs
        "llm_embedding_near_dup",                # applyInPandas tiled GEMM
        "llm_semantic_dedup",                    # applyInPandas per-cell GEMM
        "llm_embedding_decontamination_planted", # mapInPandas benchmark GEMM
        "llm_embedding_decontamination_pruned",  # mapInPandas IVF-pruned GEMM
        "agg_heavy_hitters_event_types",         # mapInPandas Misra-Gries sketch
        # hierarchical CC finish: single-task union-find over the CONTRACTED
        # edge set (<=3M rows by construction) — metadata-scale, not
        # corpus-scale; the corpus-sized work stays JVM-side upstream
        "llm_dedup_clusters", "llm_dedup_clusters_star",
        "llm_corpus_build_e2e",  # + the same single-task CC finish over the
                                 # fuzzy-dedup stage's verified pair set
        "connector_json_landing", "connector_csv_landing",  # file-source landings
    }
    PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "FlatMapGroupsInPandas", "PythonUDTF", "MapInArrow")
    offenders = {}
    for name, qd in all_queries().items():
        df = qd.fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [n for n in PY_NODES if n in plan]
        if hits and name not in PYTHON_IS_THE_OPERATOR:
            offenders[name] = hits
    assert not offenders, f"Python nodes in JVM-only plans: {offenders}"


def test_invariant_queries_avoid_expand_and_stay_single_pass(spark):
    """Plan-shape guards for the round-3 invariant queries:

    - agg_approx_distinct_parts must NOT plan an Expand node — mixing the
      HLL sketch with count_distinct in one aggregate triples scan rows
      (measured ~3x at sf0.1); the exact side runs as distinct -> count
      joined back by broadcast;
    - llm_hot_shingle_cap must evaluate the shingle explode exactly once
      (one Generate node) — the audit formerly re-ran the whole subtree
      for before/after stats.
    """
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    qs = all_queries()
    a3 = _physical_plan(qs["agg_approx_distinct_parts"].fn(spark, SF))
    assert "Expand" not in a3, "A3 regressed to the Expand-planning aggregate"
    assert "BroadcastHashJoin" in a3

    cap = _physical_plan(qs["llm_hot_shingle_cap"].fn(spark, SF))
    assert cap.count("Generate explode") + cap.count("Generate posexplode") == 1, (
        "hot-shingle cap should evaluate the shingle explode exactly once"
    )


def test_heavy_neardup_plans_stay_bucketed(spark):
    """Plan-shape pins for the bench's heaviest queries (VERDICT r3 task 7):
    the banded/bucketed near-dup family must never plan an all-pairs
    CartesianProduct — candidate generation is an equi-join on (band, hash)
    buckets, which at 100 TB is the difference between O(collisions) and
    O(n^2). llm_cosine_topk is the one documented exact-baseline crossJoin
    and is excluded deliberately (DESIGN.md; similarity.py)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    qs = all_queries()
    # near-dup family: zero row-level cross joins allowed anywhere.
    # ANN recall queries: exactly ONE allowed — the embedded exact Q x N
    # baseline (bounded query side, broadcast) that the recall invariant is
    # measured against; their LSH/IVF candidate side must stay bucketed.
    BUCKETED = {
        "llm_minhash_near_dup": 0,
        "llm_simhash_near_dup": 0,
        "llm_simhash_banded_near_dup": 0,
        "llm_dedup_clusters": 0,
        "llm_dedup_clusters_star": 0,
        "llm_ngram_jaccard_pairs": 0,
        "llm_incremental_dedup_admission": 0,
        "llm_ann_lsh_topk": 1,
        # IVF: baseline cross + the queries x centroids probe (n_lists rows,
        # broadcast — the standard IVF structure; Q x n_lists, not Q x N)
        "llm_ann_ivf_topk": 2,
    }
    def _scalar_children_only(plan: str) -> list[str]:
        """Return offending BNLJ sites whose children are NOT both scalar
        (keys=[]) aggregates. A scalar x scalar nested loop is a 1x1 row
        join (the invariant-form recall checks); anything else is a real
        row-level nested loop."""
        import re

        bad: list[str] = []
        lines = plan.splitlines()

        def depth(line: str) -> int:
            # tree printer uses 3-char units of ':  '/'   ' padding then an
            # optional ':- '/'+- ' branch marker before the node name
            m = re.match(r"^((?:[: ]  )*)([:+]- )?", line)
            return len(m.group(1)) + (3 if m.group(2) else 0)

        for i, ln in enumerate(lines):
            if "BroadcastNestedLoopJoin" not in ln:
                continue
            d = depth(ln)
            child_idx = []
            for j in range(i + 1, len(lines)):
                dj = depth(lines[j])
                if dj <= d:
                    break
                if dj == d + 3:
                    child_idx.append(j)
            child_idx = child_idx[:2]

            WRAPPERS = (
                "BroadcastExchange",
                "ReusedExchange",
                "WholeStageCodegen",
                "InputAdapter",
                "Project",
                "ColumnarToRow",
            )

            def _scalar(j: int) -> bool:
                # unwrap single-child wrappers until a real node; a 1-row
                # side is a keys=[] aggregate (or a reused broadcast of one)
                k = j
                for _ in range(8):
                    node = re.sub(r"^[: +\-]*", "", lines[k])
                    if node.startswith("HashAggregate(keys=[]") or node.startswith(
                        "SortAggregate(key=[]"
                    ):
                        return True
                    if not node.startswith(WRAPPERS):
                        return False
                    dk = depth(lines[k])
                    nxt = [
                        m
                        for m in range(k + 1, len(lines))
                        if depth(lines[m]) == dk + 3
                    ]
                    if not nxt:
                        # ReusedExchange prints with no child; it only ever
                        # reuses a broadcast built elsewhere — treat the
                        # reference as scalar iff it mentions a 1-col output
                        return node.startswith("ReusedExchange")
                    k = nxt[0]
                return False

            # quadratic only when NEITHER side is a 1-row scalar
            if not any(_scalar(j) for j in child_idx):
                bad.append("\n".join([ln] + [lines[j] for j in child_idx]))
        return bad

    for name, allowed in BUCKETED.items():
        plan = _physical_plan(qs[name].fn(spark, SF))
        assert "CartesianProduct" not in plan, (
            f"{name} planned an all-pairs CartesianProduct — the bucketed "
            f"candidate join regressed to O(n^2)"
        )
        offenders = _scalar_children_only(plan)
        assert len(offenders) <= allowed, (
            f"{name}: {len(offenders)} row-level nested-loop join(s), "
            f"{allowed} allowed — candidate generation must stay an "
            f"equi-join on bucket keys:\n" + "\n".join(offenders)
        )


def test_round4_addition_plan_shapes(spark):
    """Plan-shape pins for the round-4 additions (same discipline as the
    near-dup pins above):

    - dedup_blocked_edit_distance: the ER self-join must hit the composite
      block key as an EQUI join — a nested-loop over part pairs is the
      O(n^2) failure the blocking exists to prevent;
    - analytics_value_outliers_iqr: fences reach the fact scan by
      broadcast, never a fact-side shuffle join;
    - llm_bm25_search: the global top-20 must plan TakeOrderedAndProject
      (per-partition heaps), not a full sort;
    - dq_constraint_report: all five constraints share ONE scan of orders
      (the fused-analyzer claim in DESIGN.md).
    """
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    qs = all_queries()
    ed = _physical_plan(qs["dedup_blocked_edit_distance"].fn(spark, SF))
    assert "CartesianProduct" not in ed
    assert "BroadcastNestedLoopJoin" not in ed

    iqr = _physical_plan(qs["analytics_value_outliers_iqr"].fn(spark, SF))
    assert "BroadcastHashJoin" in iqr

    bm = _physical_plan(qs["llm_bm25_search"].fn(spark, SF))
    assert "TakeOrderedAndProject" in bm

    dq = _physical_plan(qs["dq_constraint_report"].fn(spark, SF))
    n_scans = dq.count("Scan parquet") + dq.count("BatchScan")
    assert n_scans == 1, f"constraint report should fuse into one scan:\n{dq[:600]}"


def test_vector_search_round4_plan_shapes(spark):
    """llm_filtered_cosine_topk must join query-side-broadcast on the
    label key (BroadcastHashJoin — per-query work bounded by the label
    partition, not the corpus); llm_embedding_decontamination's only
    nested-loop is the bounded benchmark broadcast."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    qs = all_queries()
    f = _physical_plan(qs["llm_filtered_cosine_topk"].fn(spark, SF))
    assert "BroadcastHashJoin" in f
    assert "CartesianProduct" not in f

    d = _physical_plan(qs["llm_embedding_decontamination"].fn(spark, SF))
    assert "CartesianProduct" not in d
    assert "BroadcastNestedLoopJoin" in d  # bounded benchmark side broadcast


def test_skew_mitigation_identical_under_planted_skew(spark):
    """In-suite twin of tools/bench_skew.py (BENCH_SKEW.md): one key
    carries 50% of the fact side. Asserts the three properties the bench
    relies on, at test scale:

    - salted_join reproduces the naive join exactly on the skewed key;
    - the salt actually spreads the straggler: the heaviest reduce
      partition's row share (Spark's own pmod(hash, P) placement) drops
      by at least 4x vs hash(k) alone;
    - AQE's runtime skew split engages on this shape when its thresholds
      see the skew (final adaptive plan carries skew=true).
    """
    n, keys = 200_000, 500
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(keys))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(keys)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 101).cast("long").alias("v"),
    )
    dim = spark.range(keys + 1).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("long").alias("w")
    )
    salted = salted_join(fact, dim, on="k", salt=16)
    plain = fact.join(dim, "k")
    agg = lambda df: tuple(  # noqa: E731 — exact integer aggregate
        df.agg(F.count(F.lit(1)), F.sum(F.col("v") * F.col("w"))).collect()[0]
    )
    assert agg(salted) == agg(plain)

    n_part = 32

    def max_share(cols):
        top = (
            fact.groupBy(F.pmod(F.hash(*cols), F.lit(n_part)).alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        return top / n

    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(16))
    assert max_share(["k"]) >= 0.5  # the planted straggler is real
    assert max_share(["k", salt_col]) * 4 <= max_share(["k"])

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # 8k: the hot partition's COMPRESSED shuffle size at test scale is
        # well under the production default — the threshold must see it
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = fact.join(dim, "k").agg(F.count(F.lit(1)))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_langid_predict_broadcasts_profiles(spark):
    """llm_langid_ngram's profile join must stay a BroadcastHashJoin (the
    profile table is the languages x capped-trigrams dim; a shuffle join
    there would re-shuffle the corpus trigram stream at 100 TB) and its
    plan must never contain a cartesian."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    p = _physical_plan(all_queries()["llm_langid_ngram"].fn(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_salted_aggs_identical_under_planted_skew(spark):
    """Both aggregation-salting forms reproduce the naive aggregate
    exactly on a planted hot key — including the correctness trap each
    one's salt choice exists for: salted_agg_sum's row-uniform salt must
    survive low-cardinality values (a value-hash salt would re-collapse
    onto one bucket), and salted_agg_count_distinct's value-hash salt
    must keep buckets a PARTITION of the value space (counts add) and
    ignore NULL values like count_distinct itself does."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.skew import (
        salted_agg_count_distinct,
        salted_agg_sum,
    )

    n, keys = 100_000, 50
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(keys))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(keys)))
        .cast("long")
        .alias("k"),
        F.lit(1).cast("long").alias("flag"),  # worst case for value-hash salt
        # high-cardinality distinct target with planted NULLs every 7th row
        F.when(F.col("id") % 7 != 0, F.pmod(F.col("id"), F.lit(5000))).alias("card"),
    )
    naive_sum = {
        (r.k, r.total)
        for r in fact.groupBy("k").agg(F.sum("flag").alias("total")).collect()
    }
    assert {
        (r.k, r.total)
        for r in salted_agg_sum(fact, key="k", value="flag", salt=16).collect()
    } == naive_sum
    naive_cd = {
        (r.k, r.n_distinct)
        for r in fact.groupBy("k")
        .agg(F.count_distinct("card").alias("n_distinct"))
        .collect()
    }
    assert {
        (r.k, r.n_distinct)
        for r in salted_agg_count_distinct(
            fact, key="k", value="card", salt=16
        ).collect()
    } == naive_cd


def test_cosine_near_pairs_chunk_size_invariant(spark, monkeypatch):
    """The in-task GEMM chunking (second tiling level — what bounds peak
    sims memory when a block is oversized) is an execution detail too:
    forcing single-digit-row chunks must return the exact pair set of the
    unchunked run, including across the diagonal tile's triangle mask."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators import (
        similarity as S,
    )

    emb = load_table(spark, SF, "embeddings")
    base = sorted(map(tuple, S.cosine_near_pairs(emb, 0.35, n_blocks=2).collect()))
    monkeypatch.setattr(S, "_GEMM_CHUNK_ELEMS", 7)  # a few rows per chunk
    tiny = sorted(map(tuple, S.cosine_near_pairs(emb, 0.35, n_blocks=2).collect()))
    assert tiny == base and len(base) > 0


def test_advanced_round7_plan_shapes(spark):
    """Plan-shape pins for the plans/advanced.py quartet:

    - analytics_ols_price_by_size: the closed-form grouped regression is
      ONE scan and ONE partial-aggregable shuffle — no join anywhere (the
      whole point of folding the normal equations into moment sums);
    - analytics_skyline_parts: the O(N log N) rewrite must never plan the
      quadratic dominance join its SQL definition implies (no cartesian /
      nested-loop), and the frontier re-join must be a broadcast semi;
    - layout_zorder_order_stats: bucket + Morton interleave are pure
      codegen arithmetic — no Python eval node may appear.
    """
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    qs = all_queries()

    ols = _physical_plan(qs["analytics_ols_price_by_size"].fn(spark, SF))
    assert "Join" not in ols, f"regression plan grew a join:\n{ols[:600]}"
    n_scans = ols.count("Scan parquet") + ols.count("BatchScan")
    assert n_scans == 1
    # partial aggregation: HashAggregate both below and above the exchange
    assert ols.count("HashAggregate") >= 2

    sky = _physical_plan(qs["analytics_skyline_parts"].fn(spark, SF))
    assert "CartesianProduct" not in sky
    assert "BroadcastNestedLoopJoin" not in sky
    assert "BroadcastHashJoin" in sky and "LeftSemi" in sky

    z = _physical_plan(qs["layout_zorder_order_stats"].fn(spark, SF))
    assert "BatchEvalPython" not in z and "ArrowEvalPython" not in z


def test_pagerank_bit_identical_across_partitionings(spark):
    """The fixed-point-integer claim made falsifiable: PageRank ranks must
    be BIT-identical when the shuffle partition count changes. (A float
    implementation fails this — per-dst summation order shifts with the
    partitioning and drifts the low bits, which is exactly why the ranks
    are BIGINT micro-units with integer div damping.)"""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    fn = all_queries()["graph_pagerank_suppliers"].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = [tuple(r) for r in fn(spark, SF).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = [tuple(r) for r in fn(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b and len(a) > 0


def test_zorder_layout_actually_prunes_both_dimensions(spark):
    """The reason Z-order exists: a single-attribute predicate must open
    only a minority of z-laid-out files. With 16 files over a 16x16 grid,
    a cb=7 point predicate touches the files whose cb-range straddles 7 —
    strictly fewer than all of them (a date-sorted 1-D layout opens ALL
    files for any cb predicate)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    rows = all_queries()["layout_zorder_order_stats"].fn(spark, SF).collect()
    assert len(rows) > 1
    hit = sum(r.hits_cb7 for r in rows)
    assert 0 < hit < len(rows), f"no pruning: {hit}/{len(rows)} files hit"


def test_zorder_written_files_enable_two_dimensional_pruning(spark, tmp_path):
    """The write-side of layout_zorder_order_stats, executed for real:
    orders written as 16 parquet files via repartitionByRange(z) +
    sortWithinPartitions(z) vs the same data date-sorted (the 1-D layout).
    Reading each file's REAL footer stats back (min/max of the customer
    bucket), a cb=7 point predicate can skip a strict majority of
    z-ordered files — while under the date-sorted layout every single
    file straddles cb=7 and nothing can be skipped. Results of the
    filtered read are identical under both layouts."""
    import pyarrow.parquet as pq
    import glob as _glob

    from custom_python_etl_data_connector_rohitharumugams_spark.plans.advanced import (
        _Z_SIDE,
        _interleave_spark,
    )

    orders = load_table(spark, SF, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("dmin"),
        F.datediff(
            F.max("o_orderdate").cast("date"), F.min("o_orderdate").cast("date")
        ).alias("span"),
    )
    coded = (
        orders.crossJoin(F.broadcast(bounds))
        .withColumn("cb", (F.col("o_custkey") % _Z_SIDE).cast("int"))
        .withColumn(
            "db",
            F.expr(
                f"cast((datediff(cast(o_orderdate as date), cast(dmin as date))"
                f" * {_Z_SIDE}) div (span + 1) as int)"
            ),
        )
        .withColumn("z", F.expr(_interleave_spark("cb", "db")))
        .drop("dmin", "span")
    )
    zpath = str(tmp_path / "orders_z")
    dpath = str(tmp_path / "orders_datesorted")
    coded.repartitionByRange(16, "z").sortWithinPartitions("z").write.mode(
        "overwrite"
    ).parquet(zpath)
    coded.repartitionByRange(16, "db").sortWithinPartitions("db").write.mode(
        "overwrite"
    ).parquet(dpath)

    def files_hit(path: str) -> tuple[int, int]:
        hit = total = 0
        for f in _glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "cb"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            total += 1
            if min(mins) <= 7 <= max(maxs):
                hit += 1
        return hit, total

    z_hit, z_total = files_hit(zpath)
    d_hit, d_total = files_hit(dpath)
    assert z_total >= 8 and d_total >= 8
    assert d_hit == d_total, "1-D date-sorted layout should never prune on cb"
    assert z_hit * 2 < z_total, (
        f"z-order should let a cb=7 predicate skip most files ({z_hit}/{z_total})"
    )
    # and the filtered reads agree
    zc = spark.read.parquet(zpath).where("cb = 7").count()
    dc = spark.read.parquet(dpath).where("cb = 7").count()
    assert zc == dc == coded.where("cb = 7").count() > 0


def test_corpus_build_e2e_scans_are_pruned(spark):
    """The one-plan corpus build's 100 TB claim in its docstring: every
    scan of the documents table is pruned to the 2-3 columns the build
    actually consumes (doc_id/text for dedup+contamination postings,
    +source for the main branch) — never the full 5-column schema. A
    regression here (e.g. a new stage selecting '*') would re-read the
    whole corpus width per stage."""
    import re

    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    plan = _physical_plan(all_queries()["llm_corpus_build_e2e"].fn(spark, SF))
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", plan))
    assert schemas, "no parquet scans found in the e2e plan"
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"doc_id", "text", "source"}, f"unpruned scan: {cols}"


def test_bucketed_join_exchange_count_is_load_bearing(spark, tmp_path):
    """Negative control for layout_bucketed_join_noshuffle's oracle-pinned
    join_exchanges=0: the SAME measurement over tables whose bucket counts
    MISMATCH must count exchanges > 0 — i.e. the pinned column can actually
    go red on a broken layout, it is not a constant."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators import bucketing

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bjneg LOCATION '{tmp_path}/wh'")
    try:
        orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
        li = load_table(spark, SF, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        bucketing.write_bucketed(orders, "bjneg.orders_b", "o_orderkey", n_buckets=8)
        bucketing.write_bucketed(li, "bjneg.lineitem_b", "o_orderkey", n_buckets=4)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bjneg.lineitem_b").join(
                spark.table("bjneg.orders_b"), ["o_orderkey"]
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") > 0, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bjneg CASCADE")


def test_partition_prune_scan_count_is_load_bearing(spark):
    """Negative control for layout_partitioned_prune's partitions_scanned=1:
    the SAME input_file_name() measurement with a two-month filter reports
    2 directories, and with no filter reports every directory — the pruned
    count tracks the predicate, not the layout constant."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans.advanced import (
        _partitioned_orders,
    )

    loc = _partitioned_orders(spark, SF)
    part = spark.read.parquet(loc)

    def dirs_read(df) -> int:
        files = [r["f"] for r in df.select(F.input_file_name().alias("f")).distinct().collect()]
        return len({f.rsplit("/", 2)[1] for f in files})

    months = sorted(r["ym"] for r in part.select("ym").distinct().collect())
    assert dirs_read(part.where(F.col("ym").isin(months[:2]))) == 2
    assert dirs_read(part) == len(months)


def test_cdc_ivm_matches_direct_recompute_in_spark(spark):
    """The IVM query's delta algebra must equal a from-scratch Spark
    recompute of the merged state (the DuckDB oracle proves cross-engine;
    this pins the algebra within Spark under a different plan shape, and
    would catch a sign error the oracle shares by construction if someone
    edits both sides symmetrically)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    maintained = {
        (r["o_orderstatus"], r["n_orders"], r["price_cents"])
        for r in all_queries()["cdc_incremental_agg_maintenance"].fn(spark, SF).collect()
    }
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    k = F.col("o_orderkey")
    merged = (
        orders.where(~((k % 89 == 0) & (k % 97 != 0)))
        .select(
            "o_orderstatus",
            F.when(k % 97 == 0, F.col("cents") + 1000).otherwise(F.col("cents")).alias("cents"),
        )
        .unionByName(
            orders.where(k % 101 == 0).select(
                F.lit("I").alias("o_orderstatus"), (k % 9999).cast("bigint").alias("cents")
            )
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("price_cents"),
        )
    )
    recomputed = {
        (r["o_orderstatus"], r["n_orders"], r["price_cents"]) for r in merged.collect()
    }
    assert maintained == recomputed


def test_distribution_drift_reference_self_check_and_rederivation(spark):
    """dq_distribution_drift semantics, re-derived independently in
    pandas from raw (year, bin) counts: the reference year must report
    tv_ppm = 0 / drift False (self-check), every fixture year must
    appear, and each year's tv_ppm must equal the integer
    parts-per-million L1 sum computed outside Spark — pinning the metric
    definition, not just engine parity (the oracle row already pins
    DuckDB agreement)."""
    import math

    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    qs = all_queries()
    out = {r.yr: r for r in qs["dq_distribution_drift"].fn(spark, SF).collect()}
    o = load_table(spark, SF, "orders").toPandas()
    o["yr"] = o["o_orderdate"].dt.year
    o["bin"] = (o["o_totalprice"] // 50000).clip(upper=9).astype(int)
    counts = o.groupby(["yr", "bin"]).size()
    years = sorted(o["yr"].unique())
    ref = {b: int(counts.get((1995, b), 0)) for b in range(10)}
    M = sum(ref.values())
    ref_ppm = {b: ref[b] * 1_000_000 // M for b in range(10)}
    assert set(out) == set(years)
    for yr in years:
        cur = {b: int(counts.get((yr, b), 0)) for b in range(10)}
        N = sum(cur.values())
        tv = sum(
            abs(cur[b] * 1_000_000 // N - ref_ppm[b]) for b in range(10)
        )
        assert out[yr].n_rows == N and out[yr].tv_ppm == tv, yr
        assert out[yr].drift == (tv > 200_000), yr
    assert out[1995].tv_ppm == 0 and not out[1995].drift


def test_route_join_salts_planted_power_law_and_matches_naive(spark):
    """DETECT -> MITIGATE wiring (operators/skew.route_join): on a
    planted power-law key (50% of fact rows on one key, well past the
    profiler's salt threshold) the router must (a) choose the salt
    branch with the documented ceil(max_mult * P / n_rows) factor,
    (b) reproduce the naive join byte-identically, and (c) actually
    spread the straggler (heaviest reduce-partition share drops >= 4x)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.skew import (
        SALT_CAP,
        choose_route,
        route_join,
    )

    n, keys = 200_000, 5000  # n_keys > broadcast ceiling, hot key 50%
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(keys))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(keys)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 101).cast("long").alias("v"),
    )
    dim = spark.range(keys + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("long").alias("w"),
    )
    routed, dec = route_join(fact, dim, on="k", parallelism=32)
    assert dec["route"] == "salt"
    # hot key ~ n/2 rows => ceil(max_mult * 32 / n) ~= 16
    want_salt = min(
        SALT_CAP, max(2, (dec["max_mult"] * 32 + dec["n_rows"] - 1) // dec["n_rows"])
    )
    assert dec["salt"] == want_salt and 8 <= dec["salt"] <= 32
    agg = lambda df: tuple(  # noqa: E731 — exact integer aggregate
        df.agg(F.count(F.lit(1)), F.sum(F.col("v") * F.col("w"))).collect()[0]
    )
    assert agg(routed) == agg(fact.join(dim, "k"))

    n_part = 32

    def max_share(cols):
        top = (
            fact.withColumn(
                "__salt", F.pmod(F.xxhash64("k", "v"), F.lit(dec["salt"]))
            )
            .groupBy(F.pmod(F.hash(*cols), F.lit(n_part)).alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        return top / n

    assert max_share(["k", "__salt"]) * 4 <= max_share(["k"])

    # decision function unit checks: the other two branches, plus the
    # huge-dim case the fact profile alone cannot see (few fact keys but
    # a non-broadcastable right side -> must NOT broadcast)
    assert choose_route(10_000, 900, 20, dim_rows=900)[0] == "broadcast_dim"
    assert choose_route(10_000, 5000, 15, dim_rows=5000)[0] == "hash_ok"
    assert choose_route(10_000, 900, 20, dim_rows=50_000_000)[0] == "hash_ok"


def test_route_join_broadcasts_small_dim(spark):
    """A <=1000-key fact side routes to the broadcast branch and the
    executed plan actually carries a BroadcastHashJoin."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.skew import (
        route_join,
    )

    fact = spark.range(10_000).select(
        F.pmod(F.col("id"), F.lit(100)).alias("k"),
        (F.col("id") % 11).alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("w")
    )
    routed, dec = route_join(fact, dim, on="k")
    assert (dec["route"], dec["salt"]) == ("broadcast_dim", 0)
    routed.collect()
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_route_join_hash_ok_branch_plain_join(spark):
    """A wide uniform key (n_keys above the broadcast ceiling, no skew)
    routes to the plain hash join and still matches the direct join."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.skew import (
        route_join,
    )

    fact = spark.range(50_000).select(
        F.pmod(F.xxhash64("id"), F.lit(5000)).alias("k"),
        (F.col("id") % 13).alias("v"),
    )
    dim = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )
    routed, dec = route_join(fact, dim, on="k")
    assert (dec["route"], dec["salt"]) == ("hash_ok", 0)
    agg = lambda df: tuple(  # noqa: E731
        df.agg(F.count(F.lit(1)), F.sum(F.col("v") * F.col("w"))).collect()[0]
    )
    assert agg(routed) == agg(fact.join(dim, "k"))
