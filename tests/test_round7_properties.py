"""Behavioral properties of the round-7 fixes (ADVICE r6): exact
integer quantile ranks for arbitrary q, null-payload media decode,
empty-build-slice semdedup guards, and the JPEG malformed-input
contract (SOS before SOF, truncated entropy data) — plus the round-7
operators: pr12 heavy hitters (mergeable CM state, no-false-negative
guarantee) and mm10 AVI demux (roundtrip, malformed-input bounds).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators import jpeg as jp
from migrator_spark.operators import multimodal as mm
from migrator_spark.operators.multimodal import decode_media, decode_metadata
from migrator_spark.operators.quality import (
    _cm_state,
    portable_heavy_hitters,
    sampled_quantiles,
)
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


# --- pr12: heavy hitters — mergeable state + CM guarantee ------------------


def _tok(spark, rows):
    return spark.createDataFrame(rows, "grp string, word string")


def test_cm_state_is_a_pure_function_of_the_multiset(spark):
    # shard sketches merge by cell ADDITION: cells(A ⊎ B) must equal
    # the per-cell sum of cells(A) and cells(B) — the property that
    # makes the state portable across partitionings and engines
    rows = [("g", f"w{i % 7}") for i in range(50)]
    full = _tok(spark, rows)
    a, b = _tok(spark, rows[:23]), _tok(spark, rows[23:])
    m, d = 64, 3
    _, _, cf = _cm_state(full, "word", "grp", m, d)
    _, _, ca = _cm_state(a, "word", "grp", m, d)
    _, _, cb = _cm_state(b, "word", "grp", m, d)
    merged = (
        ca.unionAll(cb)
        .groupBy("grp", "_i", "_pos")
        .agg(F.sum("_c").alias("_c"))
    )
    key = lambda r: (r["grp"], r["_i"], r["_pos"])  # noqa: E731
    assert {key(r): r["_c"] for r in cf.collect()} == {
        key(r): r["_c"] for r in merged.collect()
    }


def test_heavy_hitters_no_false_negatives_and_one_sided_error(spark):
    # 40 tokens: 'hot' x 20, 'warm' x 10, ten singletons; phi = 1/4 ->
    # threshold ceil(40/4) = 10. Every truly-heavy key (hot, warm) MUST
    # appear (cm_estimate >= true_count), and every reported estimate
    # must dominate its true count (CM error is one-sided)
    rows = (
        [("g", "hot")] * 20 + [("g", "warm")] * 10
        + [("g", f"cold{i}") for i in range(10)]
    )
    out = portable_heavy_hitters(
        _tok(spark, rows), key_col="word", group_col="grp",
        phi=(1, 4), m=1024, d=3,
    ).collect()
    got = {r["word"]: r for r in out}
    assert {"hot", "warm"} <= set(got)
    assert got["hot"]["is_true_heavy"] and got["warm"]["is_true_heavy"]
    for r in out:
        assert r["cm_estimate"] >= r["true_count"]
        assert r["threshold"] == 10


def test_heavy_hitters_integer_threshold_rounds_up(spark):
    # n=10, phi=1/3: exact integer threshold is ceil(10/3) = 4 — a
    # float floor(3.33)+adjust path would admit count-3 keys
    rows = [("g", "a")] * 4 + [("g", "b")] * 3 + [("g", "c")] * 3
    out = portable_heavy_hitters(
        _tok(spark, rows), key_col="word", group_col="grp", phi=(1, 3)
    ).collect()
    true_heavy = {r["word"] for r in out if r["is_true_heavy"]}
    assert true_heavy == {"a"}
    assert all(r["threshold"] == 4 for r in out)


def test_heavy_hitters_null_group_kept(spark):
    rows = [(None, "x")] * 5 + [(None, "y")] * 1
    out = portable_heavy_hitters(
        _tok(spark, rows), key_col="word", group_col="grp", phi=(1, 2)
    ).collect()
    assert {r["word"] for r in out if r["is_true_heavy"]} == {"x"}
    assert all(r["grp"] is None for r in out)


# --- mm10: AVI demux — roundtrip + malformed-input contract ----------------


def test_avi_synth_demux_decode_roundtrip(spark):
    # n_chars=7 -> 1+(7%5)=3 frames at height 8*(1+7%3)=16; each frame
    # must demux out as a genuine JPEG whose full decode reproduces the
    # block-constant pixel sums of the synthesis formula
    docs = spark.createDataFrame([(1, 7)], "doc_id long, n_chars long")
    payload = bytes(
        mm.synth_mjpeg_avi_payloads(docs, width=16).collect()[0]["payload"]
    )
    frames = mm.avi_jpeg_frames(payload)
    assert len(frames) == 3
    for f, fr in enumerate(frames):
        w, h, _ch, psum = jp.jpeg_decode(fr)
        assert (w, h) == (16, 16)
        want = 64 * sum(
            (23 * bx + 41 * by + 17 * f) % 256
            for bx in range(2) for by in range(2)
        )
        assert psum == want, (f, psum, want)


def test_avi_frame_stats_samples_every_n(spark):
    docs = spark.createDataFrame([(1, 9)], "doc_id long, n_chars long")  # 5 frames
    pay = mm.synth_mjpeg_avi_payloads(docs, width=16)
    idx = sorted(
        r["frame_idx"] for r in mm.avi_frame_stats(pay, every_n=2).collect()
    )
    assert idx == [0, 2, 4]
    with pytest.raises(ValueError, match="every_n"):
        mm.avi_frame_stats(pay, every_n=0)


def test_avi_malformed_inputs_raise_valueerror():
    with pytest.raises(ValueError, match="not a RIFF"):
        mm.avi_jpeg_frames(b"JFIF" + bytes(20))
    with pytest.raises(ValueError, match="not a RIFF"):
        mm.avi_jpeg_frames(None)
    with pytest.raises(ValueError, match="RIFF but not AVI"):
        mm.avi_jpeg_frames(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    # truncated chunk: declared size overruns the buffer
    trunc = (
        b"RIFF" + (100).to_bytes(4, "little") + b"AVI "
        + b"00dc" + (999).to_bytes(4, "little") + bytes(8)
    )
    with pytest.raises(ValueError, match="truncated AVI chunk"):
        mm.avi_jpeg_frames(trunc)
    # pathological LIST nesting must hit the depth bound, not recurse
    body = b"00dc" + (0).to_bytes(4, "little")
    for _ in range(40):
        inner = b"movi" + body
        body = b"LIST" + len(inner).to_bytes(4, "little") + inner
    deep = b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"AVI " + body
    with pytest.raises(ValueError, match="nesting too deep"):
        mm.avi_jpeg_frames(deep)


# --- pr13: KMV set ops — mergeable state + estimator contracts -------------


def test_kmv_state_merge_equals_union_bottom_k(spark):
    # union + re-bottom-k of two groups' states must equal the bottom-k
    # of the union of the raw sets — the property that makes the state
    # a pure function of the set and the pairwise stage exact
    import hashlib

    from migrator_spark.operators.quality import portable_kmv_setops

    rows = [("a", f"k{i}") for i in range(300)] + [
        ("b", f"k{i}") for i in range(150, 450)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    k = 16
    out = portable_kmv_setops(df, "key", "grp", k=k, domain_bits=48).collect()
    assert len(out) == 1
    r = out[0]
    # independent recompute of the merged bottom-k in plain python
    # (md5 hex prefix base-16 == conv(substring(md5,1,15),16,10))
    h = lambda s: int(  # noqa: E731
        hashlib.md5(s.encode()).hexdigest()[:15], 16
    ) // (1 << 12)
    ha = sorted(h(f"k{i}") for i in range(300))[:k]
    hb = sorted(h(f"k{i}") for i in range(150, 450))[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    theta = merged[-1]
    want_union = (k - 1) * (1 << 48) // max(theta, 1)
    c = sum(1 for x in merged if x in set(ha) and x in set(hb))
    assert r["k_eff"] == k
    assert r["union_est"] == want_union
    assert r["inter_est"] == c * want_union // k
    assert r["true_union"] == 450 and r["true_inter"] == 150


def test_kmv_small_sets_are_exact(spark):
    # sets smaller than k: states are complete, every estimate EXACT
    from migrator_spark.operators.quality import portable_kmv_setops

    rows = [("a", f"x{i}") for i in range(10)] + [
        ("b", f"x{i}") for i in range(5, 17)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    r = portable_kmv_setops(df, "key", "grp", k=64).collect()[0]
    assert (r["n_a"], r["n_b"]) == (10, 12)
    assert (r["est_a"], r["est_b"]) == (10, 12)
    assert r["union_est"] == r["true_union"] == 17
    assert r["inter_est"] == r["true_inter"] == 5


def test_kmv_null_group_kept_and_decoded(spark):
    from migrator_spark.operators.quality import portable_kmv_setops

    rows = [(None, f"x{i}") for i in range(8)] + [
        ("b", f"x{i}") for i in range(4, 12)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    out = portable_kmv_setops(df, "key", "grp", k=64).collect()
    assert len(out) == 1
    r = out[0]
    # sentinel sorts before 'b' so the null group lands in grp_a, as NULL
    assert r["grp_a"] is None and r["grp_b"] == "b"
    assert r["true_inter"] == 4


def test_kmv_rejects_bad_params(spark):
    from migrator_spark.operators.quality import portable_kmv_setops

    df = spark.createDataFrame([("a", "x")], "grp string, key string")
    with pytest.raises(ValueError, match="k must be"):
        portable_kmv_setops(df, "key", "grp", k=1)
    with pytest.raises(ValueError, match="domain_bits"):
        portable_kmv_setops(df, "key", "grp", domain_bits=49)


# --- mm11: WAV PCM decode + windowed features -------------------------------


def _wav(n, rate=8000):
    import struct

    data = struct.pack("<" + "h" * n, *(((i * 37) % 8191 - 4096) for i in range(n)))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm_roundtrip_and_features(spark):
    # 300 samples -> frames of 256 + 44; recompute features in python
    payload = _wav(300)
    ch, rate, s = mm.wav_pcm_samples(payload)
    assert (ch, rate, len(s)) == (1, 8000, 300)
    assert list(s[:3]) == [-4096, -4059, -4022]
    docs = spark.createDataFrame([(7, 300)], "doc_id long, n_chars long")
    out = {
        r["frame_idx"]: r
        for r in mm.audio_frame_features(
            mm.synth_wav_payloads(docs), frame=256
        ).collect()
    }
    assert set(out) == {0, 1}
    vals = [(i * 37) % 8191 - 4096 for i in range(300)]
    for f0, n in ((0, 256), (1, 44)):
        w = vals[f0 * 256 : f0 * 256 + 256]
        r = out[f0]
        assert r["n_samples"] == n
        assert r["energy"] == sum(v * v for v in w)
        assert r["zero_crossings"] == sum(
            1 for a, b in zip(w, w[1:]) if a * b < 0
        )
        assert r["peak_abs"] == max(abs(v) for v in w)
        assert r["sum_abs"] == sum(abs(v) for v in w)


def test_wav_malformed_inputs_raise(spark):
    import struct

    with pytest.raises(ValueError, match="not a RIFF"):
        mm.wav_pcm_samples(b"JUNK" + bytes(20))
    with pytest.raises(ValueError, match="RIFF but not WAVE"):
        mm.wav_pcm_samples(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    # data chunk before fmt
    body = b"WAVE" + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    with pytest.raises(ValueError, match="data chunk before fmt"):
        mm.wav_pcm_samples(b"RIFF" + struct.pack("<I", len(body)) + body)
    # truncated chunk: declared size overruns buffer
    good = _wav(10)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        mm.wav_pcm_samples(good[:-4])
    # odd data size for 16-bit PCM
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 3) + b"\x00\x00\x00"
    )
    with pytest.raises(ValueError, match="odd byte count"):
        mm.wav_pcm_samples(b"RIFF" + struct.pack("<I", len(body)) + body)
    # non-PCM format code: honest capability guard
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    with pytest.raises(NotImplementedError, match="non-PCM"):
        mm.wav_pcm_samples(b"RIFF" + struct.pack("<I", len(body)) + body)
    docs = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
    with pytest.raises(ValueError, match="frame must be"):
        mm.audio_frame_features(mm.synth_wav_payloads(docs), frame=1)
