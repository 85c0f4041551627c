"""Round 13 (VERDICT r12 #4 / ADVICE r12 #3): the learned tokenizer as
a VERSIONED artifact.

* merges + vocab publish as tagged rows of ONE OCC table, so the pair
  swaps atomically as a unit — a racing reader can never pair merges
  from version N with vocab from version N+1 (the r12 two-table layout
  protected only the FIRST publish);
* a retrain publishes a NEW version; in-flight consumers of the
  previous version are undisturbed (version-pinned reads keep
  resolving, and a DataFrame resolved before the republish still
  evaluates to the old snapshot);
* retention is bounded in writing (KEEP_TOKENIZER_VERSIONS) and
  expired versions raise KeyError, like ParquetSource.table_at.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators import textops as tx
from migrator_spark.sources.artifacts import (
    BPE_MERGES,
    BPE_VOCAB,
    KEEP_TOKENIZER_VERSIONS,
    ArtifactStore,
)
from migrator_spark.sources.parquet import ParquetSource
from migrator_spark.tables import load_table

N_MERGES = 4
HOLDOUT = "src0"


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def tokenizers(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t1 = docs.filter((F.col("source") != HOLDOUT) & (F.col("lang") == "de"))
    t2 = docs.filter(F.col("source") != HOLDOUT)
    m1 = tx.bpe_train_merges(t1, num_merges=N_MERGES)
    m2 = tx.bpe_train_merges(t2, num_merges=N_MERGES)
    return (m1, tx.bpe_vocab(t1, m1)), (m2, tx.bpe_vocab(t2, m2))


def test_republish_creates_new_version_and_pins_old(spark, tokenizers, tmp_path):
    (m1, v1), (m2, v2) = tokenizers
    store = ArtifactStore(str(tmp_path))
    assert store.write_bpe_tokenizer(m1, v1) == 1
    assert store.write_bpe_tokenizer(m2, v2) == 2
    fresh = ArtifactStore(str(tmp_path))
    assert fresh.bpe_tokenizer_versions(spark) == [1, 2]
    rm, rv = fresh.read_bpe_tokenizer(spark)  # default: newest
    assert _sorted(rm) == _sorted(m2) and _sorted(rv) == _sorted(v2)
    rm1, rv1 = fresh.read_bpe_tokenizer(spark, version=1)  # pinned
    assert _sorted(rm1) == _sorted(m1) and _sorted(rv1) == _sorted(v1)
    with pytest.raises(KeyError, match="not retained"):
        fresh.read_bpe_tokenizer(spark, version=9)


def test_inflight_reader_undisturbed_by_republish(spark, tokenizers, tmp_path):
    """The art-family warm-read discipline across a republish: a
    consumer that resolved version 1 BEFORE the retrain keeps a
    complete, consistent snapshot — both because the resolved
    DataFrame pins the committed version directory and because the
    version-1 rows are retained in the new commit."""
    (m1, v1), (m2, v2) = tokenizers
    store = ArtifactStore(str(tmp_path))
    store.write_bpe_tokenizer(m1, v1)
    rm_before, rv_before = ArtifactStore(str(tmp_path)).read_bpe_tokenizer(spark)
    want_m, want_v = _sorted(m1), _sorted(v1)
    store.write_bpe_tokenizer(m2, v2)  # republish lands mid-read
    # the in-flight handles still evaluate to the v1 tokenizer
    assert _sorted(rm_before) == want_m and _sorted(rv_before) == want_v
    # and a pinned re-read from a FRESH handle agrees
    rm1, rv1 = ArtifactStore(str(tmp_path)).read_bpe_tokenizer(spark, version=1)
    assert _sorted(rm1) == want_m and _sorted(rv1) == want_v


def test_pair_can_never_mix_versions(spark, tokenizers, tmp_path):
    """ADVICE r12 #3: every retained version carries BOTH parts in one
    committed snapshot — there is no commit state in which merges and
    vocab come from different versions."""
    (m1, v1), (m2, v2) = tokenizers
    store = ArtifactStore(str(tmp_path))
    store.write_bpe_tokenizer(m1, v1)
    store.write_bpe_tokenizer(m2, v2)
    t = ParquetSource(f"{tmp_path}/tables").table(spark, "bpe_tokenizer")
    parts = {
        (int(r["tokenizer_version"]), r["part"])
        for r in t.select("tokenizer_version", "part").distinct().collect()
    }
    for v in (1, 2):
        assert (v, "merge") in parts and (v, "vocab") in parts


def test_version_retention_bounded(spark, tokenizers, tmp_path):
    (m1, v1), (m2, v2) = tokenizers
    store = ArtifactStore(str(tmp_path))
    n = KEEP_TOKENIZER_VERSIONS + 2
    for i in range(n):
        store.write_bpe_tokenizer(m1 if i % 2 else m2, v1 if i % 2 else v2)
    versions = store.bpe_tokenizer_versions(spark)
    assert versions == list(range(n - KEEP_TOKENIZER_VERSIONS, n + 1))
    with pytest.raises(KeyError, match="not retained"):
        store.read_bpe_tokenizer(spark, version=1)


def test_legacy_two_table_store_still_reads(spark, tokenizers, tmp_path):
    """Pre-r13 stores (separate bpe_merges/bpe_vocab tables) keep
    working as a single-version store."""
    (m1, v1), _ = tokenizers
    ps = ParquetSource(f"{tmp_path}/tables")
    ps.write(v1, BPE_VOCAB)
    ps.write(m1, BPE_MERGES)
    store = ArtifactStore(str(tmp_path))
    assert store.has_bpe_tokenizer(spark)
    assert store.bpe_tokenizer_versions(spark) == [1]
    rm, rv = store.read_bpe_tokenizer(spark)
    assert _sorted(rm) == _sorted(m1) and _sorted(rv) == _sorted(v1)
    rm1, _ = store.read_bpe_tokenizer(spark, version=1)
    assert _sorted(rm1) == _sorted(m1)
    with pytest.raises(KeyError, match="not retained"):
        store.read_bpe_tokenizer(spark, version=2)
