"""Round 12: the learned BPE tokenizer as a persisted artifact
(VERDICT r11 #3) — store round-trip, and the serving contract: every
consumer fed the READ-BACK tokenizer produces output bit-identical to
the in-session training it replaces.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from migrator_spark.operators import textops as tx
from migrator_spark.sources.artifacts import ArtifactStore
from migrator_spark.tables import load_table

N_MERGES = 6
HOLDOUT = "src0"


def _slices(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source") != HOLDOUT),
        docs.filter(F.col("source") == HOLDOUT),
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_bpe_tokenizer_store_roundtrip(spark, sf_dir, tmp_path):
    train, _held = _slices(spark, sf_dir)
    merges = tx.bpe_train_merges(train, num_merges=N_MERGES)
    vocab = tx.bpe_vocab(train, merges)
    store = ArtifactStore(str(tmp_path))
    assert not store.has_bpe_tokenizer(spark)
    store.write_bpe_tokenizer(merges, vocab)
    assert store.has_bpe_tokenizer(spark)
    # fresh handle: resolution from the on-disk commit log alone
    merges2, vocab2 = ArtifactStore(str(tmp_path)).read_bpe_tokenizer(spark)
    assert _sorted(merges2) == _sorted(merges)
    assert _sorted(vocab2) == _sorted(vocab)
    # a republish atomically replaces the committed version
    store.write_bpe_tokenizer(merges.limit(3), vocab)
    merges3, _ = ArtifactStore(str(tmp_path)).read_bpe_tokenizer(spark)
    assert len(_sorted(merges3)) == 3


def test_bpe_serving_off_warm_read_is_bit_identical(spark, sf_dir, tmp_path):
    """The VERDICT r11 #3 pin: bpe4's apply and bpe5's encode, fed the
    fresh-handle read-back tokenizer, must be bit-identical to serving
    off the in-session training — both are pure functions of
    (docs, merges[, vocab]), and strings/longs round-trip parquet
    exactly."""
    train, held = _slices(spark, sf_dir)
    merges = tx.bpe_train_merges(train, num_merges=N_MERGES)
    vocab = tx.bpe_vocab(train, merges)
    ArtifactStore(str(tmp_path)).write_bpe_tokenizer(merges, vocab)
    merges2, vocab2 = ArtifactStore(str(tmp_path)).read_bpe_tokenizer(spark)

    warm_apply = _sorted(tx.bpe_apply_merges(held, merges2))
    assert warm_apply == _sorted(tx.bpe_apply_merges(held, merges))
    assert len(warm_apply) > 0

    warm_encode = _sorted(tx.bpe_encode(held, merges2, vocab2))
    assert warm_encode == _sorted(tx.bpe_encode(held, merges, vocab))
    assert len(warm_encode) > 0
