"""Invariant tests for the training-data pipeline extensions (L6-L10).
Value correctness is the DuckDB parity mirror (test_oracle_parity); these
assert the structural properties parity cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries
from custom_python_etl_data_connector_rohitharumugams_spark.plans.llm_pipeline import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    PACK_BUDGET,
)

SMOKE_SF = "/root/testdata/sf0.001"
QS = all_queries()


def test_chunking_covers_every_token_without_gaps(spark):
    """Chunk count per doc must equal floor((n_tokens-1)/stride)+1 — the
    sliding window reaches the last token — and no chunk exceeds the size."""
    chunks = QS["llm_chunk_documents"].fn(spark, SMOKE_SF)
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"), F.max("n_tokens").alias("max_chunk")
    )
    bad = (
        per_doc.join(docs, "doc_id")
        .where(
            (F.col("n_chunks") != F.floor((F.col("n_tokens") - 1) / CHUNK_STRIDE) + 1)
            | (F.col("max_chunk") > CHUNK_SIZE)
        )
        .count()
    )
    assert bad == 0


def test_packing_bins_are_contiguous_and_bounded(spark):
    """Every bin holds <= budget + its largest doc (contiguous fill can
    overflow only by the straddling doc), and bin ids per source are a
    gapless 0..max sequence."""
    bins = QS["llm_sequence_packing"].fn(spark, SMOKE_SF).cache()
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet").select(
        F.size(F.split("text", " ")).alias("n_tokens")
    )
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    assert bins.where(F.col("total_tokens") > PACK_BUDGET + max_doc).count() == 0
    seq = bins.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bins"), (F.max("bin_id") + 1).alias("expect")
    )
    assert seq.where(F.col("n_bins") != F.col("expect")).count() == 0
    bins.unpersist()


def test_split_is_deterministic_and_roughly_90_10(spark):
    r1 = QS["llm_stratified_split"].fn(spark, SMOKE_SF).toPandas()
    r2 = QS["llm_stratified_split"].fn(spark, SMOKE_SF).toPandas()
    key = lambda p: sorted(map(tuple, p.values.tolist()))
    assert key(r1) == key(r2)
    totals = r1.groupby("split")["n_docs"].sum()
    frac = totals.get("val", 0) / totals.sum()
    assert 0.03 < frac < 0.20, f"val fraction {frac} implausible for a 90/10 split"


def test_benchmark_overlap_never_flags_benchmark_docs(spark):
    ov = QS["llm_benchmark_overlap"].fn(spark, SMOKE_SF)
    assert ov.where(F.col("doc_id") % 97 == 0).count() == 0
    assert ov.where(F.col("benchmark_id") % 97 != 0).count() == 0


def test_pii_scrub_counts_reconcile(spark):
    """Injected PII is fully counted: total emails == docs with id%7==0,
    phones == id%11==0 (the fixture corpus itself carries none)."""
    rep = QS["llm_pii_scrub"].fn(spark, SMOKE_SF).toPandas()
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    n7 = docs.where(F.col("doc_id") % 7 == 0).count()
    n11 = docs.where(F.col("doc_id") % 11 == 0).count()
    assert rep.total_emails.sum() == n7
    assert rep.total_phones.sum() == n11
    assert (rep.chars_removed >= 0).all()


def test_connected_components_chains_and_cycles(spark):
    """Multi-hop chains collapse to one component (A-B, B-C, C-D => all
    labeled A) and cycles terminate; two disjoint components stay apart."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain
         (10, 11), (11, 12), (12, 10),  # cycle
         (4, 1)],                       # extra cycle edge inside chain
        "doc_id_1 bigint, doc_id_2 bigint",
    )
    got = {
        (r.vertex, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10)}


def test_cc_distributed_rounds_above_local_threshold(spark):
    """UNPATCHED scale stress: a planted-chain graph whose edge count
    exceeds _LOCAL_SOLVE_EDGES, so both CC variants take their REAL
    distributed branches (no monkeypatching) — label propagation runs
    diameter-many shuffle rounds, large/small star contracts — and both
    must match the closed-form ground truth exactly. This is the in-suite
    companion of tools/bench_cc_scale.py (which runs 3x bigger and
    records per-round shuffle volumes into BENCH_CC_SCALE.md)."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators import graph

    n_comp, chain = 360_000, 4  # 1.08M edges > 1M threshold, diameter 3
    edges = graph.chain_graph(spark, n_comp, chain)
    truth = F.col("vertex") - (F.col("vertex") % chain)
    for fn in (graph.connected_components, graph.connected_components_star):
        stats: dict = {}
        labels = fn(edges, stats=stats)
        assert stats["mode"] == "distributed", f"{fn.__name__} took local path"
        assert stats["rounds"], f"{fn.__name__} recorded no distributed rounds"
        assert labels.where(F.col("component") != truth).count() == 0
        assert labels.count() == n_comp * chain


def test_dedup_clusters_label_twin_pairs_together(spark):
    """Every planted exact twin lands in its twin's cluster: run the
    clustering over near-dup pairs of the twinned corpus."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.graph import (
        connected_components,
    )
    d = spark.read.parquet(f"{SMOKE_SF}/documents.parquet").select("doc_id", "text")
    twins = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 100_000))
    # exact-duplicate pairs as edges: same md5 => edge (min_id, other_id)
    h = twins.select("doc_id", F.md5("text").alias("dig"))
    e = (
        h.alias("a")
        .join(h.alias("b"), (F.col("a.dig") == F.col("b.dig")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
    )
    comps = connected_components(e).toPandas()
    by_vertex = dict(zip(comps.vertex, comps.component))
    n = d.count()
    for i in range(n):
        assert by_vertex.get(i + 100_000) == by_vertex.get(i, i), f"twin {i} split"


def test_connected_components_raises_when_not_converged(spark, monkeypatch):
    """Exhausting max_iter without convergence must fail loudly — silently
    non-minimal labels would split one true cluster into several. The local
    single-task finish is disabled so the distributed loop actually runs."""
    import pytest as _pytest

    from custom_python_etl_data_connector_rohitharumugams_spark.operators import graph

    monkeypatch.setattr(graph, "_LOCAL_SOLVE_EDGES", 0)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_id_1 bigint, doc_id_2 bigint"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(chain, max_iter=2)
    # and with enough rounds the same chain converges to one component
    full = graph.connected_components(chain, max_iter=10)
    assert full.select("component").distinct().count() == 1


class TestShardSink:
    """Training-shard sink (sources/shardsink.py): deterministic layout,
    manifest integrity, and input-partitioning invariance."""

    def _splits(self, spark, sf_dir):
        from custom_python_etl_data_connector_rohitharumugams_spark.catalog import load_table
        from custom_python_etl_data_connector_rohitharumugams_spark.sources.shardsink import (
            shard_assignment,
        )
        from pyspark.sql import functions as F

        d = load_table(spark, sf_dir, "documents")
        return d.withColumn(
            "split",
            F.when(shard_assignment(F.col("doc_id"), 10) < 9, "train").otherwise("val"),
        )

    def test_write_read_roundtrip_and_manifest(self, spark, tmp_path):
        from custom_python_etl_data_connector_rohitharumugams_spark.sources import shardsink

        df = self._splits(spark, "/root/testdata/sf0.001")
        out = str(tmp_path / "shards")
        manifest = shardsink.write_training_shards(df, out, n_shards=4)
        assert sum(m["rows"] for m in manifest.values()) == df.count()
        # every (split, shard) dir exists exactly as the manifest says
        import glob

        dirs = {
            p.split("shards/")[1].replace("split=", "").replace("shard=", "").rstrip("/")
            for p in glob.glob(f"{out}/split=*/shard=*/")
        }
        assert dirs == set(manifest)
        back = shardsink.read_training_shards(spark, out)
        assert back.count() == df.count()
        assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
            r["doc_id"] for r in df.select("doc_id").collect()
        )
        assert shardsink.verify_training_shards(spark, out)["ok"]

    def test_shard_membership_invariant_to_input_partitioning(self, spark, tmp_path):
        from custom_python_etl_data_connector_rohitharumugams_spark.sources import shardsink

        df = self._splits(spark, "/root/testdata/sf0.001")
        a = shardsink.write_training_shards(df, str(tmp_path / "a"), n_shards=4)
        b = shardsink.write_training_shards(
            df.repartition(17), str(tmp_path / "b"), n_shards=4
        )
        assert a == b

    def test_verify_detects_tamper(self, spark, tmp_path):
        import glob
        import os

        from custom_python_etl_data_connector_rohitharumugams_spark.sources import shardsink

        df = self._splits(spark, "/root/testdata/sf0.001")
        out = str(tmp_path / "shards")
        shardsink.write_training_shards(df, out, n_shards=4)
        victim = sorted(glob.glob(f"{out}/split=train/shard=0/*.parquet"))[0]
        os.remove(victim)
        res = shardsink.verify_training_shards(spark, out)
        assert not res["ok"] and any(k.startswith("train/0") for k in res["mismatched"])


def test_incremental_dedup_rejects_planted_batch_dups(spark, tmp_path):
    """Planted scenarios for llm_incremental_dedup_admission (the fixture
    corpus has no near-dups on the batch residue, so the reject paths are
    pinned here): a batch copy of a corpus doc is rejected, batch-internal
    twins keep only the lowest id, unique batch docs are admitted — and
    corpus docs are never re-examined (absent from the output)."""
    import random

    from custom_python_etl_data_connector_rohitharumugams_spark.plans.llm_pipeline import (
        llm_incremental_dedup_admission,
    )

    rng = random.Random(7)
    rows = []
    # >20 filler docs so twin shingles stay under the 10% DF cap
    for i in range(1, 30):
        if i % 5 == 0:
            continue  # fillers are corpus-side only
        words = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((i, words, "en", "src0", len(words)))
    twin_text = " ".join(f"twin{j}" for j in range(12))
    pair_text = " ".join(f"pair{j}" for j in range(12))
    uniq_text = " ".join(f"uniq{j}" for j in range(12))
    rows.append((3001, twin_text, "en", "src0", len(twin_text)))   # corpus original
    rows.append((35, twin_text, "en", "src0", len(twin_text)))     # batch copy -> reject
    rows.append((40, pair_text, "en", "src0", len(pair_text)))     # batch twin, lowest -> admit
    rows.append((45, pair_text, "en", "src0", len(pair_text)))     # batch twin -> reject
    rows.append((50, uniq_text, "en", "src0", len(uniq_text)))     # unique -> admit
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {
        int(r.doc_id): bool(r.admitted)
        for r in llm_incremental_dedup_admission(spark, sf).collect()
    }
    assert out[35] is False, "batch copy of a corpus doc must be rejected"
    assert out[40] is True, "lowest-id batch twin must be admitted"
    assert out[45] is False, "higher-id batch twin must be rejected"
    assert out[50] is True, "unique batch doc must be admitted"
    assert 3001 not in out and 3 not in out, "corpus docs must not be re-adjudicated"


def test_corpus_neardup_stage_is_exact(spark):
    """The corpus builds' fuzzy-dedup contract (NEARDUP_TAU note): the
    banded MinHash+LSH+verify stage must reproduce the EXACT 3-gram
    Jaccard pair set over the exact-dedup survivors — the oracles
    compute that exact set a priori, so a single banding miss is a
    driver hash mismatch. Pinned at sf0.001 and sf0.01 here (the driver
    certifies sf0.01); sf0.1 measured 241/241 with zero extras (r12).
    The fixture margin makes this robust, not lucky: every true pair
    sits at J >= 0.9 (banding miss probability < 1e-4 per pair, and
    xxhash64 is deterministic, so 'measured 100%' is frozen), while the
    densest non-pair is at J <= 0.14 — a ~4x gap on both sides of 0.5."""
    import duckdb

    from custom_python_etl_data_connector_rohitharumugams_spark.operators.dedup import exact_dedup
    from custom_python_etl_data_connector_rohitharumugams_spark.plans.llm_pipeline import (
        NEARDUP_PAIRS_CTES,
        neardup_stage,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        truth = set(
            map(
                tuple,
                con.execute(
                    f"""
                    WITH k0 AS (
                        SELECT MIN(doc_id) AS doc_id FROM documents
                        GROUP BY COALESCE(md5(text),
                                          '__null__' || CAST(doc_id AS VARCHAR))
                    ),
                    kept AS (
                        SELECT d.doc_id, d.text FROM documents d
                        JOIN k0 USING (doc_id)
                    ),
                    {NEARDUP_PAIRS_CTES}
                    SELECT doc_id_1, doc_id_2 FROM ndpairs
                    """
                ).fetchall(),
            )
        )
        d = spark.read.parquet(f"{sf}/documents.parquet")
        _, verified = neardup_stage(exact_dedup(d))
        got = {(r.doc_id_1, r.doc_id_2) for r in verified.collect()}
        assert got == truth, (
            f"{sf}: banded pairs != exact pairs; "
            f"missed={sorted(truth - got)[:5]} extra={sorted(got - truth)[:5]}"
        )
        assert truth, f"{sf}: fixture lost its planted near-dups"


def test_incremental_greedy_keeper_differs_from_component_min(spark):
    """Pin the documented semantics split between the two corpus builds:
    on a 'late bridge' pair set {(1,3), (2,3)} the incremental build's
    arrival-ordered greedy rule keeps doc 2 (no verified neighbor with a
    SMALLER id), while the one-shot build's component-min keeper would
    evict it (the bridge doc 3 merges {1,3} and {2,3} into one component
    with min 1). This is exactly why component-min cannot be computed
    incrementally — the merge retroactively changes an already-shipped
    batch's keeper set — and why _inc_neardup_drops exists."""
    from custom_python_etl_data_connector_rohitharumugams_spark.operators.graph import (
        connected_components,
    )
    from custom_python_etl_data_connector_rohitharumugams_spark.plans.llm_pipeline import (
        _inc_neardup_drops,
    )

    pairs = spark.createDataFrame(
        [(1, 3), (2, 3)], "doc_id_1 bigint, doc_id_2 bigint"
    )
    greedy = {r.doc_id for r in _inc_neardup_drops(pairs).collect()}
    comps = connected_components(pairs)
    cc_drops = {
        r.vertex
        for r in comps.where(F.col("vertex") != F.col("component")).collect()
    }
    assert greedy == {3}
    assert cc_drops == {2, 3}


def test_corpus_build_e2e_reports_live_neardup_drops(spark):
    """n_neardup_dropped must be a real, non-zero measurement of the fuzzy
    stage (the fixture generator plants near-dup pairs at every tier) and
    constant across the report's rows (it is a global stage statistic)."""
    rows = QS["llm_corpus_build_e2e"].fn(spark, SMOKE_SF).collect()
    drops = {r.n_neardup_dropped for r in rows}
    assert len(drops) == 1 and drops.pop() > 0


def test_corpus_build_to_shards_matches_report_and_oracle(spark):
    """The staged round-13 shipping closure (llm_corpus_build_to_shards,
    deliberately unregistered — the round-12 window is exactly full):
    the report computed FROM THE WRITTEN SHARDS must equal
    llm_corpus_build_e2e's numbers row-for-row with shards_verified True
    everywhere, and must match its staged DuckDB oracle
    (CORPUS_TO_SHARDS_ORACLE) the way the driver will check it."""
    import duckdb

    from custom_python_etl_data_connector_rohitharumugams_spark.plans.llm_pipeline import (
        CORPUS_TO_SHARDS_ORACLE,
        llm_corpus_build_to_shards,
    )

    got = llm_corpus_build_to_shards(spark, SMOKE_SF).toPandas()
    assert got["shards_verified"].all()
    base = QS["llm_corpus_build_e2e"].fn(spark, SMOKE_SF).toPandas()
    shared = ["source", "split", "n_docs", "total_tokens", "n_shards",
              "n_neardup_dropped"]
    assert got[shared].values.tolist() == base[shared].values.tolist()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SMOKE_SF}/documents.parquet')"
    )
    want = con.execute(CORPUS_TO_SHARDS_ORACLE).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    assert sorted(map(tuple, got[cols].values.tolist())) == sorted(
        map(tuple, want[cols].values.tolist())
    )
