"""Round-10 properties: atomic shingle-index republish (VERDICT r9
#4), session-store eviction hygiene (ADVICE r9 #1), the warm-read
artifact graded row's fresh-catalog discipline (VERDICT r9 #2), and
the A->B->C carried-identity chain (VERDICT r9 #7)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from migrator_spark.operators import dedup as dd
from migrator_spark.sources.artifacts import ArtifactStore
from migrator_spark.tables import load_table


def _rows(df):
    return sorted(map(repr, (tuple(r) for r in df.collect())))


# ------------------------------------------------ atomic republish


def test_shingle_republish_keeps_previous_snapshot(spark, sf_dir, tmp_path):
    """A reader concurrent with a republish sees the OLD or the NEW
    snapshot, never a torn one: the sidecar swap is atomic
    (os.replace) and the previous version's files are retained for one
    generation, so a DataFrame resolved against the old sidecar stays
    fully readable while the new version is live."""
    docs = load_table(spark, sf_dir, "documents")
    full = dd.shingle_index(docs, attrs=["lang", "source"])
    store = ArtifactStore(str(tmp_path / "art"))

    store.write_shingle_index(full, buckets=8)
    assert store.shingle_index_version() == 1
    v1 = store.read_shingle_index(spark)  # the "in-flight reader"
    n1 = v1.count()
    assert n1 == full.count()

    # republish a DIFFERENT snapshot (a pruned corpus) underneath it
    pruned = full.filter(F.col("doc_id") % 2 == 0)
    store.write_shingle_index(pruned, buckets=8)
    assert store.shingle_index_version() == 2
    # the old reader's snapshot is intact (files + catalog entry kept)
    assert v1.count() == n1
    assert os.path.isdir(store._shingle_version_path(1))
    # a fresh resolve gets the committed new version
    v2 = store.read_shingle_index(spark)
    assert v2.count() == pruned.count() < n1

    # a third publish prunes v1 (older than the previous generation)
    store.write_shingle_index(full, buckets=8)
    assert store.shingle_index_version() == 3
    assert not os.path.isdir(store._shingle_version_path(1))
    assert os.path.isdir(store._shingle_version_path(2))
    assert not spark.catalog.tableExists(store.shingle_table_name(1))
    assert store.read_shingle_index(spark).count() == n1


def test_shingle_sidecar_names_the_version_it_describes(
    spark, sf_dir, tmp_path
):
    """The sidecar is the single source of truth: its `version` field
    and the directory the registered table points at move together,
    and the sidecar is published AFTER the version directory is
    complete (write-temp-then-replace)."""
    docs = load_table(spark, sf_dir, "documents")
    idx = dd.shingle_index(docs, attrs=["lang"])
    store = ArtifactStore(str(tmp_path / "art"))
    store.write_shingle_index(idx, buckets=4)
    store.write_shingle_index(idx, buckets=4)
    with open(store._shingle_meta()) as fh:
        meta = json.load(fh)
    assert meta["version"] == 2
    assert meta["buckets"] == 4
    assert os.path.isdir(store._shingle_version_path(2))
    # no torn-write residue
    assert not os.path.exists(store._shingle_meta() + ".tmp")
    back = store.read_shingle_index(spark)
    assert back.count() == idx.count()


def test_legacy_unversioned_sidecar_still_reads(spark, sf_dir, tmp_path):
    """Pre-r10 stores (no `version` in the sidecar, data under
    `shingle_index/`) keep reading: the registration falls back to the
    legacy name and location."""
    docs = load_table(spark, sf_dir, "documents")
    idx = dd.shingle_index(docs, attrs=["lang"])
    store = ArtifactStore(str(tmp_path / "art"))
    store.write_shingle_index(idx, buckets=4)
    store.unregister_shingle_index(spark)
    # rewrite the store into the legacy on-disk shape
    os.rename(store._shingle_version_path(1), f"{store.root}/shingle_index")
    with open(store._shingle_meta()) as fh:
        meta = json.load(fh)
    meta.pop("version")
    with open(store._shingle_meta(), "w") as fh:
        json.dump(meta, fh)
    back = store.read_shingle_index(spark)
    assert back.count() == idx.count()
    legacy_name = store.shingle_table_name(0).removesuffix("_v0")
    assert spark.catalog.tableExists(legacy_name)
    spark.sql(f"DROP TABLE IF EXISTS {legacy_name}")


# ------------------------------------- session-store eviction hygiene


def test_session_store_eviction_reclaims_tmp_and_catalog(
    spark, sf_dir, monkeypatch
):
    """ADVICE r9 #1: evicting a session-store entry from the shared
    shingle cache must reclaim its temp parquet copy AND its catalog
    table immediately, not at process exit — a long session cycling
    many sf_dirs may not accumulate full-index copies in /tmp."""
    from migrator_spark.plans import llmdata

    docs = load_table(spark, sf_dir, "documents").limit(40)
    monkeypatch.setattr(llmdata, "load_table", lambda sp, d, name: docs)
    monkeypatch.setattr(llmdata, "_SHINGLE_IDX_KEEP", 2)
    saved_cache = dict(llmdata._SHINGLE_IDX_CACHE)
    saved_clean = dict(llmdata._SHINGLE_IDX_CLEANUP)
    llmdata._SHINGLE_IDX_CACHE.clear()
    llmdata._SHINGLE_IDX_CLEANUP.clear()
    try:
        roots = {}
        for fake in ("evict_a", "evict_b", "evict_c"):
            llmdata._shared_shingle_index(spark, fake)
            key = (spark.sparkContext.applicationId, fake)
            assert key in llmdata._SHINGLE_IDX_CACHE
            roots[fake] = llmdata._SESSION_ART_ROOTS[-1]
        # KEEP=2: inserting evict_c evicted evict_a -> its temp root is
        # gone, its catalog tables dropped, the roots list pruned
        assert not os.path.exists(roots["evict_a"])
        assert roots["evict_a"] not in llmdata._SESSION_ART_ROOTS
        gone = ArtifactStore(roots["evict_a"])
        assert not spark.catalog.tableExists(gone.shingle_table_name(1))
        # the retained entries are intact and queryable
        for live in ("evict_b", "evict_c"):
            assert os.path.exists(roots[live])
            key = (spark.sparkContext.applicationId, live)
            assert llmdata._SHINGLE_IDX_CACHE[key].count() > 0
    finally:
        # dispose whatever this test created, then restore prior state
        for key in list(llmdata._SHINGLE_IDX_CACHE):
            llmdata._SHINGLE_IDX_CACHE.pop(key)
            disposer = llmdata._SHINGLE_IDX_CLEANUP.pop(key, None)
            if disposer is not None:
                disposer(spark)
        llmdata._SHINGLE_IDX_CACHE.update(saved_cache)
        llmdata._SHINGLE_IDX_CLEANUP.update(saved_clean)


# ----------------------------------------- e2e drain batch-size floor


def test_pipeline_drain_is_multibatch_at_smoke_sf(spark, sf_dir):
    """ADVICE r9 #4: with the 200-row batch floor gone
    (batch = ceil(n_queue/4)), the e2e drain takes ~4 E->T->L cycles
    even at the sf0.001 smoke fixture — the multi-batch
    offsets/cleanup-ordering surface is exercised at EVERY scale
    factor, as the docstring claims."""
    import shutil
    import tempfile

    from migrator_spark.pipeline.config import (
        IterationSpec,
        MigrationSpec,
        MigratorConfig,
        Parameters,
    )
    from migrator_spark.pipeline.runner import Migrator
    from migrator_spark.plans import cdc as cdc_plans

    fx_root, n_queue = cdc_plans._pipeline_fixture(spark, sf_dir)
    assert n_queue >= 4, "fixture too small to be multi-batch at all"
    root = tempfile.mkdtemp(prefix="pipe10_")
    try:
        shutil.copytree(f"{fx_root}/a", f"{root}/a", symlinks=True)
        shutil.copytree(f"{fx_root}/b", f"{root}/b", symlinks=True)
        cfg = MigratorConfig(
            migrations=[
                MigrationSpec(
                    source_dsn=f"{root}/a",
                    target_dsn=f"{root}/b",
                    iterations=[
                        IterationSpec(
                            source_table="customer",
                            source_key="c_custkey",
                            target_table="customer",
                            merge_key="c_custkey",
                            extractor="queue",
                            transformer="default",
                            loader="default",
                        )
                    ],
                )
            ],
            parameters=Parameters(batch_size=max(1, -(-n_queue // 4))),
        )
        total = Migrator(spark, cfg, f"{root}/trk").run_until_drained()
        assert total >= 4, (total, n_queue)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------- carried-identity chain A->B->C


MEMBERS_SCHEMA = "doc_id long, cluster_id long, fp string"
PREV_SCHEMA = "doc_id long, stable_id string"


def _carry(spark, members, prev):
    from migrator_spark.operators.mixture import carry_cluster_ids

    return {
        r["doc_id"]: (r["stable_id"], r["carried"])
        for r in carry_cluster_ids(
            spark.createDataFrame(members, MEMBERS_SCHEMA),
            spark.createDataFrame(prev, PREV_SCHEMA),
        ).collect()
    }


def _as_prev(out):
    return [(d, s) for d, (s, _) in out.items()]


def test_carry_chain_survives_three_releases_through_a_merge(spark):
    """VERDICT r9 #7: the release chain COMPOSES. Ids minted in
    release A survive to release C through a pure-growth step (B) and
    a merge arranged in the B->C step; the re-key bound composes —
    total A->C churn is exactly the sum of each step's non-surviving
    merge sides (zero for the growth step)."""
    # A: four clusters
    rel_a = [
        (1, 1, "cc"), (2, 1, "dd"),      # -> f:cc
        (5, 5, "ee"),                     # -> f:ee
        (7, 7, "aa"),                     # -> f:aa
        (10, 10, "mm"), (11, 10, "nn"),  # -> f:mm
    ]
    out_a = _carry(spark, rel_a, [])
    assert out_a[1][0] == "f:cc" and out_a[10][0] == "f:mm"

    # B: pure growth — doc 3 joins cluster(1,2); new cluster (30,31)
    rel_b = [
        (1, 1, "cc"), (2, 1, "dd"), (3, 1, "bb"),
        (5, 5, "ee"),
        (7, 7, "aa"),
        (10, 10, "mm"), (11, 10, "nn"),
        (30, 30, "22"), (31, 30, "11"),  # -> f:11 (minted in B)
    ]
    out_b = _carry(spark, rel_b, _as_prev(out_a))
    assert {d for d in out_a if out_b[d][0] != out_a[d][0]} == set()
    assert out_b[3] == ("f:cc", True)
    assert out_b[30][0] == "f:11" and not out_b[30][1]

    # C: doc 40 bridges cluster(1,2,3) with cluster(10,11); cluster 5
    # grows; 50 is a new singleton
    rel_c = [
        (1, 1, "cc"), (2, 1, "dd"), (3, 1, "bb"),
        (10, 1, "mm"), (11, 1, "nn"), (40, 1, "qq"),
        (5, 5, "ee"), (6, 5, "ff"),
        (7, 7, "aa"),
        (30, 30, "22"), (31, 30, "11"),
        (50, 50, "xx"),
    ]
    out_c = _carry(spark, rel_c, _as_prev(out_b))
    # the id minted in A survives to C through the merge: the merged
    # cluster takes min("f:cc", "f:mm") = "f:cc", an A-minted identity
    assert all(
        out_c[d] == ("f:cc", True) for d in (1, 2, 3, 10, 11, 40)
    ), out_c
    # untouched chains keep their A ids verbatim
    assert out_c[5] == ("f:ee", True) and out_c[7] == ("f:aa", True)
    assert out_c[6] == ("f:ee", True)  # growth inherits, step 2 deep
    assert out_c[30] == ("f:11", True)  # B-minted id carried into C
    assert out_c[50] == ("f:xx", False)
    # composed churn bound: B->C re-keys exactly the non-surviving
    # merge side; A->C total churn equals it (the growth step added 0)
    changed_bc = {d for d in out_b if out_c[d][0] != out_b[d][0]}
    assert changed_bc == {10, 11}
    changed_ac = {d for d in out_a if out_c[d][0] != out_a[d][0]}
    assert changed_ac == changed_bc


def test_carry_chain_skipping_a_pure_growth_release_is_equivalent(spark):
    """Composition across a missed release: when step B is PURE GROWTH
    (no merges), carrying release C directly against release A's table
    equals carrying it against B's — B's only contribution is mints,
    and C re-mints them identically (content-derived ids), so a
    pipeline that skips a release's publish loses nothing but the
    carried=True flag on clusters BOTH releases would have minted
    the same way."""
    rel_a = [(1, 1, "cc"), (2, 1, "dd"), (5, 5, "ee")]
    out_a = _carry(spark, rel_a, [])
    rel_b = [
        (1, 1, "cc"), (2, 1, "dd"), (3, 1, "bb"),
        (5, 5, "ee"),
        (30, 30, "22"), (31, 30, "11"),
    ]
    out_b = _carry(spark, rel_b, _as_prev(out_a))
    rel_c = [
        (1, 1, "cc"), (2, 1, "dd"), (3, 1, "bb"),
        (5, 1, "ee"),  # C merges cluster 5 into cluster 1
        (30, 30, "22"), (31, 30, "11"),
        (50, 50, "xx"),
    ]
    via_b = _carry(spark, rel_c, _as_prev(out_b))
    via_a = _carry(spark, rel_c, _as_prev(out_a))
    assert {d: s for d, (s, _) in via_b.items()} == {
        d: s for d, (s, _) in via_a.items()
    }


# ------------------------------------------------- BPE merge training


def test_bpe_train_matches_classic_reference(spark):
    """The distributed trainer must equal the classic sequential BPE
    reference (Sennrich get_stats/merge_vocab with greedy left-to-right
    non-overlapping application and (count DESC, left ASC, right ASC)
    tiebreak) — including the run cases ('aaa', 'aaaa') where greedy
    non-overlap actually bites."""
    import collections
    import re

    from migrator_spark.operators.textops import bpe_train_merges

    texts = [
        "aaa aaa abab low lower lowest low low",
        "newer newest new abab aaaa",
        "aaaa aaaa baa aab",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges(docs, num_merges=8).collect()
    ]

    wf = collections.Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower().strip()).split(" "):
            wf[w] += 1
    vocab = dict(collections.Counter({tuple(w): f for w, f in wf.items()}))
    ref = []
    for rank in range(1, 9):
        stats = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        (l, r), c = sorted(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        ref.append((rank, l, r, c))
        nv = collections.Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = dict(nv)
    assert got == ref, (got, ref)


def test_republish_after_crashed_write_retains_committed_not_orphan(
    spark, sf_dir, tmp_path
):
    """Crash path: a write that died after creating its version dir
    but before the sidecar swap leaves an ORPHAN. The next publish
    must prune the orphan and retain the COMMITTED previous version
    (its in-flight readers depend on it) — not the other way around."""
    docs = load_table(spark, sf_dir, "documents")
    idx = dd.shingle_index(docs, attrs=["lang"])
    store = ArtifactStore(str(tmp_path / "art"))
    store.write_shingle_index(idx, buckets=4)  # committed v1
    reader = store.read_shingle_index(spark)
    n1 = reader.count()
    # simulate the crashed write: v2 dir exists, sidecar still says 1.
    # Since r13 pruning graces YOUNG uncommitted dirs (they may be a
    # concurrent builder mid-write) and ages out crashed orphans, so
    # the crash is simulated as an AGED dir — past the grace window.
    os.makedirs(store._shingle_version_path(2))
    with open(f"{store._shingle_version_path(2)}/part-junk.parquet", "wb") as fh:
        fh.write(b"not a real file")
    aged = time.time() - store.SHINGLE_ORPHAN_GRACE_SECS - 5
    os.utime(store._shingle_version_path(2), (aged, aged))
    assert store.shingle_index_version() == 1
    store.write_shingle_index(idx, buckets=4)  # becomes v3
    assert store.shingle_index_version() == 3
    assert os.path.isdir(store._shingle_version_path(1))  # committed kept
    assert not os.path.isdir(store._shingle_version_path(2))  # orphan gone
    assert reader.count() == n1  # the in-flight reader survives
