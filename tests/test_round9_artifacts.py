"""Round-9 offline artifact store (VERDICT r8 #3): the shared
shingle index / pair graph / quantizer persist as offline tables and
the write->read round trip is BIT-IDENTICAL for every consumer; the
bucketed-by-``s`` layout makes the postings self-join exchange-free
on both sides; a fresh catalog re-registers the external bucketed
table from the sidecar without losing the property."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrator_spark.operators import dedup as dd
from migrator_spark.operators import similarity as sim
from migrator_spark.operators import textops as tx
from migrator_spark.sources.artifacts import ArtifactStore
from migrator_spark.tables import load_table


def _rows(df):
    return sorted(map(repr, (tuple(r) for r in df.collect())))


def test_shingle_index_roundtrip_bit_identical(spark, sf_dir, tmp_path):
    from migrator_spark.plans.llmdata import (
        CONTAIN_THRESH,
        DD13_MAX_DIST,
        DD13_MIN_SHARED,
        NGRAM_THRESH,
        TA9_K,
        TA9_QUERY_DOC,
    )

    docs = load_table(spark, sf_dir, "documents")
    live = dd.shingle_index(docs, attrs=["lang", "source"])
    store = ArtifactStore(str(tmp_path / "art"))
    store.write_shingle_index(live, buckets=8)
    assert store.has_shingle_index()
    back = store.read_shingle_index(spark)

    consumers = {
        "dd4": lambda idx: dd.ngram_jaccard_pairs(
            docs, block_cols=["lang", "source"], threshold=NGRAM_THRESH,
            index=idx,
        ),
        "dd12": lambda idx: dd.containment_pairs(
            docs, block_cols=["lang"], threshold=CONTAIN_THRESH, index=idx
        ),
        "dd13": lambda idx: dd.edit_distance_pairs(
            docs, block_cols=["lang"], max_dist=DD13_MAX_DIST,
            min_shared=DD13_MIN_SHARED, index=idx,
        ),
        "ta9": lambda idx: tx.similar_docs_topk(
            docs, query_doc_id=TA9_QUERY_DOC, k=TA9_K, shingle_k=2,
            index=idx,
        ),
    }
    for name, fn in consumers.items():
        assert _rows(fn(back)) == _rows(fn(live)), name


def test_bucketed_postings_self_join_has_no_exchange(spark, sf_dir, tmp_path):
    """The layout claim, pinned: joining the bucketed postings with
    themselves on a key set CONTAINING s ((lang, s) — dd12/dd13's
    blocking) plans with ZERO Exchange operators — HashPartitioning(s)
    from the bucketing satisfies any clustering containing s, and
    requireAllClusterKeysForCoPartition=false lets the join accept
    the subset co-partitioning (see ArtifactStore docstring; the SMJ
    hint pins the scale shape — at this SF the tiny side would
    broadcast, which is ALSO exchange-elimination but not the one
    under test)."""
    docs = load_table(spark, sf_dir, "documents")
    store = ArtifactStore(str(tmp_path / "art"))
    store.write_shingle_index(
        dd.shingle_index(docs, attrs=["lang", "source"]), buckets=8
    )
    back = store.read_shingle_index(spark)
    a = back.select("doc_id", "lang", "s")
    b = back.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
        F.col("s").alias("s_b"),
    )
    j = a.hint("merge").join(
        b.hint("merge"),
        (a["lang"] == b["lang_b"]) & (a["s"] == b["s_b"])
        & (a["doc_id"] < b["doc_b"]),
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    old = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try:
        plan = j._jdf.queryExecution().explainString(mode)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() > 0  # and it actually executes
    finally:
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", old)


def test_shingle_index_reregisters_in_fresh_catalog(spark, sf_dir, tmp_path):
    """A session whose in-memory catalog never saw the write (restart)
    re-creates the external bucketed definition from the sidecar —
    same rows, still exchange-free."""
    docs = load_table(spark, sf_dir, "documents")
    store = ArtifactStore(str(tmp_path / "art"))
    live = dd.shingle_index(docs, attrs=["lang", "source"])
    store.write_shingle_index(live, buckets=8)
    n_live = live.count()
    # simulate the fresh catalog: drop the table (external -> data stays)
    store.unregister_shingle_index(spark)
    back = store.read_shingle_index(spark)
    assert back.count() == n_live
    a = back.select("doc_id", "s")
    b = back.select(F.col("doc_id").alias("d2"), F.col("s").alias("s2"))
    j = a.hint("merge").join(
        b.hint("merge"), (a["s"] == b["s2"]) & (a["doc_id"] < b["d2"])
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    assert "Exchange" not in j._jdf.queryExecution().explainString(mode)


def test_pair_graph_roundtrip_consumers_bit_identical(spark, sf_dir, tmp_path):
    from migrator_spark.plans.llmdata import (
        MINHASH_BANDS,
        MINHASH_NUM,
        MINHASH_THRESH,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        docs, num_hashes=MINHASH_NUM, bands=MINHASH_BANDS,
        threshold=MINHASH_THRESH,
    )
    store = ArtifactStore(str(tmp_path / "art"))
    assert not store.has_pair_graph(spark)
    store.write_pair_graph(pairs)
    assert store.has_pair_graph(spark)
    back = store.read_pair_graph(spark)
    assert _rows(back) == _rows(pairs)
    # a graph consumer over the read-back table: identical components
    assert _rows(dd.duplicate_clusters_star(back)) == _rows(
        dd.duplicate_clusters_star(pairs)
    )


def test_artifact_env_seam_warm_read_matches_build(
    spark, sf_dir, tmp_path, monkeypatch
):
    """SPARK_GRAFT_ARTIFACT_ROOT wires the offline store into the
    shared caches: the first run BUILDS and persists, a later session
    (simulated by clearing the in-session caches) READS the
    materialized artifacts, and the graded consumers return
    bit-identical rows either way."""
    from migrator_spark.plans import llmdata

    def run(name):
        fn = getattr(llmdata, name)
        return _rows(fn(spark, sf_dir))

    queries = ["ta9_similar_docs", "sm8_leakage_safe_split", "sim2_ivf_topk"]

    def clear_caches():
        llmdata._SHINGLE_IDX_CACHE.clear()
        llmdata._MINHASH_PAIRS_CACHE.clear()
        llmdata._FLAT_QUANT_CACHE.clear()

    clear_caches()
    baseline = {q: run(q) for q in queries}  # env unset: session path

    root = str(tmp_path / "warehouse")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_ROOT", root)
    clear_caches()
    built = {q: run(q) for q in queries}  # builds AND persists
    store = llmdata._artifact_store(sf_dir)
    assert store.has_shingle_index()
    assert store.has_pair_graph(spark)
    assert store.has_quantizer(spark)

    clear_caches()  # "new session": must come from the store now
    warm = {q: run(q) for q in queries}
    assert built == baseline
    assert warm == baseline
    clear_caches()  # leave no env-built entries for later tests


def test_quantizer_roundtrip_bit_identical(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cents = sim._fit_centroids(pts, 8, 2, "vec_id")
    assign = sim._assign_cells(pts, cents, "vec_id").select("vec_id", "cell")
    store = ArtifactStore(str(tmp_path / "art"))
    assert not store.has_quantizer(spark)
    store.write_quantizer(cents, assign)
    assert store.has_quantizer(spark)
    c2, a2 = store.read_quantizer(spark)
    assert _rows(c2) == _rows(cents)
    assert _rows(a2) == _rows(assign)


def test_two_level_quantizer_roundtrip_and_sd5_fold_parity(
    spark, sf_dir, tmp_path
):
    """Round 11 (VERDICT r10 #5): the super+fine codebook pair persists
    as OCC tables and the PRODUCTION two-level semdedup fold (sd5's
    plan) run off the READ-BACK quantizer is bit-identical to the
    in-session build — scoring is a pure function of (pts, coarse,
    fine) and parquet doubles round-trip exactly."""
    from migrator_spark.plans.llmdata import (
        EMB_DIM,
        SD1_TAU,
        SD3_BOUNDS,
        SIM11_ITERS,
        SIM11_KC,
        SIM11_KF,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    build_pts = pts.filter(F.col("vec_id") < SD3_BOUNDS[0])
    coarse, fine, _ = sim.fit_two_level(
        build_pts, SIM11_KC, SIM11_KF, SIM11_ITERS, "vec_id"
    )
    store = ArtifactStore(str(tmp_path / "art"))
    assert not store.has_two_level_quantizer(spark)
    store.write_two_level_quantizer(coarse, fine)
    assert store.has_two_level_quantizer(spark)
    c2, f2 = store.read_two_level_quantizer(spark)
    assert _rows(c2) == _rows(coarse)
    assert _rows(f2) == _rows(fine)

    kwargs = dict(
        boundaries=list(SD3_BOUNDS),
        iters=SIM11_ITERS,
        tau=SD1_TAU,
        dim=EMB_DIM,
        quantizer="two_level",
        k_coarse=SIM11_KC,
        k_fine=SIM11_KF,
    )
    in_session = sim.semdedup_fold(emb, **kwargs)
    warm = sim.semdedup_fold(emb, prebuilt_two_level=(c2, f2), **kwargs)
    assert _rows(warm) == _rows(in_session)
