"""Round-10 properties: atomic shingle-index republish (VERDICT r9
#4), session-store eviction hygiene (ADVICE r9 #1), the warm-read
artifact graded row's fresh-catalog discipline (VERDICT r9 #2), and
the A->B->C carried-identity chain (VERDICT r9 #7)."""

from __future__ import annotations

import json
import os

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
