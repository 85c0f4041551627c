"""Round 13: concurrent shingle-index BUILDERS (the artifact store's
last single-writer-by-assumption surface). Version allocation is now
an exclusive claim (flock + mkdir), so two simultaneous builds take
distinct version directories — the pre-r13 window let both claim
``shingle_index.v<N>`` and interleave part-files under a committed
sidecar. The sidecar swap stays last-publisher-wins, identical to two
sequential builds; pruning grace-periods young uncommitted dirs so a
concurrent in-flight build is never deleted as a crashed orphan.
"""

from __future__ import annotations

import os
import threading
import time

from pyspark.sql import functions as F

from migrator_spark.sources.artifacts import ArtifactStore
from migrator_spark.tables import load_table


def _index(spark, sf_dir, tag: int):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    return docs.select(
        F.col("doc_id"),
        F.lit(tag).alias("tag"),
        F.substring(F.col("text"), 1, 8).alias("s"),
    )


def test_concurrent_builders_take_distinct_versions(spark, sf_dir, tmp_path):
    store = ArtifactStore(str(tmp_path))
    errs = []

    def build(tag):
        try:
            store.write_shingle_index(_index(spark, sf_dir, tag), buckets=4)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=build, args=(t,)) for t in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    # three DISTINCT versions were claimed and all three directories
    # hold complete, uncorrupted tables
    assert store._shingle_versions_on_disk() == [1, 2, 3]
    committed = store.shingle_index_version()
    assert committed in (1, 2, 3)
    # the committed snapshot reads back whole, with ONE consistent tag
    # (interleaved writes from two builders into one dir would mix)
    back = store.read_shingle_index(spark)
    tags = [r[0] for r in back.select("tag").distinct().collect()]
    assert len(tags) == 1 and tags[0] in (1, 2, 3)
    assert back.count() == 200


def test_prune_graces_inflight_then_reaps_aged_orphans(spark, sf_dir, tmp_path):
    store = ArtifactStore(str(tmp_path))
    store.write_shingle_index(_index(spark, sf_dir, 1), buckets=2)
    store.write_shingle_index(_index(spark, sf_dir, 2), buckets=2)
    # fake a concurrent builder's claimed-but-unpublished version
    inflight = store._shingle_version_path(3)
    os.makedirs(inflight)
    store.write_shingle_index(_index(spark, sf_dir, 4), buckets=2)
    # v3 is young: graced, not reaped (it may be mid-build); v4 is the
    # new commit; its predecessor (v2) is retained for readers
    assert os.path.isdir(inflight)
    assert store.shingle_index_version() == 4
    # age the orphan past the grace and republish: now it reaps
    old = time.time() - store.SHINGLE_ORPHAN_GRACE_SECS - 5
    os.utime(inflight, (old, old))
    store.write_shingle_index(_index(spark, sf_dir, 5), buckets=2)
    assert not os.path.isdir(inflight)
    # committed chain intact: newest commit + its predecessor retained
    assert store.shingle_index_version() == 5
    assert 4 in store._shingle_versions_on_disk()


def test_sequential_republish_unchanged(spark, sf_dir, tmp_path):
    """The round-10 atomic-republish contract is untouched: reader of
    the previous sidecar keeps a complete snapshot for one generation,
    older generations are pruned."""
    store = ArtifactStore(str(tmp_path))
    for tag in (1, 2, 3):
        store.write_shingle_index(_index(spark, sf_dir, tag), buckets=2)
    assert store.shingle_index_version() == 3
    on_disk = store._shingle_versions_on_disk()
    assert 3 in on_disk and 2 in on_disk and 1 not in on_disk
