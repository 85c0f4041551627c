"""Behavioral properties of the round-7 fixes (ADVICE r6): exact
integer quantile ranks for arbitrary q, null-payload media decode,
empty-build-slice semdedup guards, and the JPEG malformed-input
contract (SOS before SOF, truncated entropy data).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators import jpeg as jp
from migrator_spark.operators.multimodal import decode_media, decode_metadata
from migrator_spark.operators.quality import sampled_quantiles
from migrator_spark.operators.similarity import semdedup, semdedup_fold


# --- ADVICE r6 #1: integer quantile ranks ---------------------------------


def test_sampled_quantiles_exact_rank_for_adversarial_q(spark):
    # q=0.07 over m=100: exact rational rank is ceil(7*100/100)=7, but
    # double ceil(0.07*100)=ceil(7.000000000000001)=8 — the old float
    # path picked value 8; the integer-rational path must pick 7.
    df = spark.createDataFrame(
        [(i, i, "g") for i in range(1, 101)], "event_id long, value long, grp string"
    )
    out = sampled_quantiles(
        df, value_col="value", group_col="grp", id_col="event_id",
        k=1000, qs=(0.07,),
    ).collect()[0]
    # sample = all 100 rows; rank 7 by (value, id) order -> value 7
    assert out["p7"] == 7, out


def test_sampled_quantiles_default_qs_unchanged(spark, sf_dir):
    # defaults must keep their round-6 semantics: ranks agree between
    # the rational form and double ceil for m <= k=256 at every test SF
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = sampled_quantiles(
        ev, value_col="value", group_col="event_type", id_col="event_id"
    )
    rows = out.collect()
    assert rows and all(r["p50"] is not None for r in rows)
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_sampled_quantiles_rejects_out_of_range_q(spark):
    df = spark.createDataFrame([(1, 1, "g")], "event_id long, value long, grp string")
    with pytest.raises(ValueError, match="quantiles must be"):
        sampled_quantiles(
            df, value_col="value", group_col="grp", id_col="event_id", qs=(0.0,)
        )


# --- ADVICE r6 #3: null payloads through the media decode -----------------


def test_decode_metadata_null_payload_yields_unknown_row(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"BM") + bytes(40)), (2, None)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_metadata(df).collect()}
    assert rows[2]["media_type"] == "unknown"
    assert rows[2]["width"] is None and rows[2]["phash"] is None
    # and the non-null sibling still decodes in the same batch
    assert rows[1]["n_bytes"] == 42


def test_decode_media_null_payload_yields_unknown_row(spark):
    df = spark.createDataFrame([(7, None)], "doc_id long, payload binary")
    row = decode_media(df).collect()[0]
    assert row["media_type"] == "unknown" and row["width"] is None


# --- ADVICE r6 #4: empty build slice refuses a silent empty verdict -------


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in ids],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_empty_build_sample_raises(spark):
    # ids 1..8 share no multiple of 1000 -> the 1/1000 hash sample is
    # empty at this size only if no id hashes to 0 mod 1000; force the
    # truly empty case with an empty id set under the boundary instead
    emb = _emb(spark, range(1, 9))
    with pytest.raises(ValueError, match="EMPTY build slice"):
        # boundary 0: no incumbent ids -> empty quantizer build
        semdedup_fold(emb, boundaries=[0, 4], k=2, iters=1)


def test_semdedup_small_build_sample_still_valid(spark):
    # fewer build rows than k is VALID (k shrinks locally): 1/2 sample
    # of 8 vectors with k=4 must not raise and must fate every row
    emb = _emb(spark, range(1, 9))
    out = semdedup(emb, k=4, iters=1, build_sample_mod=2).collect()
    assert len(out) == 8


# --- ADVICE r6 #5: JPEG malformed-input contract --------------------------


def test_jpeg_sos_before_sof_raises_valueerror():
    # SOI + a minimal SOS marker with no preceding SOF
    payload = bytes([0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x01, 0x00])
    with pytest.raises(ValueError, match="SOS before SOF"):
        jp.jpeg_decode(payload)


def test_jpeg_truncated_entropy_raises_valueerror(spark):
    # take a real synthesized JPEG and chop the entropy segment short:
    # the bit reader must fail with the module's ValueError contract,
    # not IndexError
    docs = spark.createDataFrame([(1, 17)], "doc_id long, n_chars long")
    payload = bytes(
        jp.synth_jpeg_payloads(docs, width=16).collect()[0]["payload"]
    )
    assert jp.jpeg_decode(payload)  # sanity: intact stream decodes
    # chop inside a marker segment (header half) AND inside the
    # entropy segment (tail): both must fail with the ValueError
    # contract ("truncated ..." / "invalid Huffman code"), never a
    # raw IndexError/TypeError
    for cut in (len(payload) // 2, len(payload) - 6):
        with pytest.raises(ValueError):
            jp.jpeg_decode(payload[:cut])
