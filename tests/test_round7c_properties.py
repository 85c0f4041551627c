"""Pins for the round-7 self-review findings: null payloads through
the media feature extractors, exact quantile LABELS, null keys through
the CM/Bloom/KMV sketches, internally-short JPEG marker segments, and
gemm_topk's zero-norm handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators import multimodal as mm
from migrator_spark.operators.jpeg import jpeg_decode
from migrator_spark.operators.quality import (
    portable_bloom,
    portable_heavy_hitters,
    portable_kmv_setops,
    sampled_quantiles,
)
from migrator_spark.operators.similarity import gemm_topk, pairwise_topk_join


# --- null payloads (review #1) ---------------------------------------------


def _payloads(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_avi_frame_stats_skips_null_payload(spark, sf_dir):
    from migrator_spark.operators.multimodal import synth_mjpeg_avi_payloads

    docs = spark.createDataFrame([(1, 30), (2, 30)], "doc_id long, n_chars long")
    good = synth_mjpeg_avi_payloads(docs).collect()
    rows = [(r["doc_id"], r["payload"]) for r in good] + [(3, None)]
    out = mm.avi_frame_stats(_payloads(spark, rows)).collect()
    assert {r.doc_id for r in out} == {1, 2}  # null row skipped, no crash


def test_audio_frame_features_skips_null_payload(spark):
    from migrator_spark.operators.multimodal import synth_wav_payloads

    docs = spark.createDataFrame([(1, 300)], "doc_id long, n_chars long")
    good = synth_wav_payloads(docs).collect()
    rows = [(r["doc_id"], r["payload"]) for r in good] + [(2, None)]
    out = mm.audio_frame_features(_payloads(spark, rows)).collect()
    assert {r.doc_id for r in out} == {1}


# --- exact quantile labels (review #2) --------------------------------------


def test_sampled_quantiles_labels_from_exact_rational(spark):
    df = spark.createDataFrame(
        [(i, i, "g") for i in range(1, 101)],
        "event_id long, value long, grp string",
    )
    out = sampled_quantiles(
        df, value_col="value", group_col="grp", id_col="event_id",
        k=1000, qs=(0.29,),
    )
    # int(0.29 * 100) == 28 under double truncation; the label must be
    # the exact percent
    assert "p29" in [f.name for f in out.schema.fields]
    # and two distinct valid quantiles must not be spuriously rejected
    out2 = sampled_quantiles(
        df, value_col="value", group_col="grp", id_col="event_id",
        k=1000, qs=(0.28, 0.29),
    )
    names = [f.name for f in out2.schema.fields]
    assert "p28" in names and "p29" in names


# --- null keys through the sketches (review #3, #5) --------------------------


def test_heavy_hitters_reports_null_key(spark):
    rows = [("g", None)] * 10 + [("g", f"k{i}") for i in range(5)]
    keys = spark.createDataFrame(rows, "grp string, k string")
    out = portable_heavy_hitters(
        keys, key_col="k", group_col="grp", phi=(1, 2)
    ).collect()
    nulls = [r for r in out if r["k"] is None]
    assert len(nulls) == 1
    assert nulls[0]["true_count"] == 10
    assert nulls[0]["cm_estimate"] >= 10  # CM one-sided guarantee holds
    assert nulls[0]["is_true_heavy"]


def test_bloom_membership_for_null_key(spark):
    keys = spark.createDataFrame(
        [("g", None), ("g", "a")], "grp string, k string"
    )
    probes = spark.createDataFrame(
        [("g", None), ("g", "a"), ("g", "zzz-not-inserted")],
        "grp string, pk string",
    )
    out = {
        r["pk"]: r["member"]
        for r in portable_bloom(
            keys, probes, key_col="k", group_col="grp", probe_col="pk"
        ).collect()
    }
    assert out[None] is True  # inserted null key is a member
    assert out["a"] is True


def test_kmv_state_with_null_key_matches_duckdb(spark):
    import duckdb

    rows = [("a", None)] + [("a", f"k{i}") for i in range(10)] + [
        ("b", f"k{i}") for i in range(3)
    ]
    items = spark.createDataFrame(rows, "grp string, k string")
    got = {
        (r["grp_a"], r["grp_b"]): (r["est_a"], r["est_b"])
        for r in portable_kmv_setops(
            items, key_col="k", group_col="grp", k=4, domain_bits=16
        ).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(
        f"('{g}', {'NULL' if k is None else repr(k)})" for g, k in rows
    )
    ora = con.execute(f"""
WITH t(g, k) AS (VALUES {vals}),
dist AS (
  SELECT DISTINCT g,
         ('0x' || substr(md5(coalesce(k, chr(0) || 'null')), 1, 15))::BIGINT
           // {1 << (60 - 16)} AS h
  FROM t
),
st AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h ASC) AS rn
    FROM dist) WHERE rn <= 4
)
SELECT g, CASE WHEN count(*) < 4 THEN count(*)
               ELSE {3 * (1 << 16)} // greatest(max(h), 1) END AS est
FROM st GROUP BY g
""").fetchall()
    duck = dict(ora)
    assert got[("a", "b")] == (duck["a"], duck["b"])
    assert duck["b"] == 3  # exact arm (3 < k): null-free group unchanged


# --- internally-short JPEG marker segments (review #4) ------------------------


@pytest.mark.parametrize(
    "payload",
    [
        # DQT declaring size 4: complete vs its own size, 2-byte body,
        # table read past the end
        b"\xff\xd8\xff\xdb\x00\x04\x00\x00",
        # SOS with an empty body (ns read past the end) after a valid SOF
        b"\xff\xd8"
        b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        b"\xff\xda\x00\x02",
        # SOS referencing a component id the SOF never declared
        b"\xff\xd8"
        b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        b"\xff\xda\x00\x06\x01\x99\x00",
        # DHT with a bits table cut short by its own size field
        b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02",
    ],
)
def test_jpeg_internally_short_segments_raise_valueerror(payload):
    with pytest.raises((ValueError, NotImplementedError)):
        jpeg_decode(payload)


# --- gemm_topk zero-norm handling (review #6) ---------------------------------


def test_gemm_topk_rejects_zero_norm_query(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    zq = spark.createDataFrame(
        [(999, [0.0] * dim)], "q_id long, qe array<float>"
    )
    with pytest.raises(ValueError, match="zero-norm"):
        gemm_topk(emb, zq, k=3)


def test_gemm_topk_zero_norm_corpus_row_matches_catalyst(spark, sf_dir):
    # Under Spark's ANSI mode a zero-norm CORPUS row makes the
    # pure-Catalyst cosine raise DIVIDE_BY_ZERO. The GEMM pruner marks
    # zero-norm rows +inf so they always become candidates — the
    # rescore then raises the SAME error instead of silently dropping
    # the row (error parity, not silent divergence).
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    with_zero = emb.unionByName(
        spark.createDataFrame(
            [(100000, [0.0] * dim, 0)],
            "vec_id long, embedding array<float>, label int",
        )
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        pairwise_topk_join(with_zero, queries, k=4).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        gemm_topk(with_zero, queries, k=4).collect()


# --- two-level sampled build (review #8) --------------------------------------


def test_semdedup_two_level_sampled_build_covers_all_rows(spark, sf_dir):
    from migrator_spark.operators.similarity import semdedup_two_level

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semdedup_two_level(
        emb, k_coarse=2, k_fine=2, iters=1, tau=0.95, build_sample_mod=4
    )
    assert out.count() == emb.count()  # full corpus scored, none lost


def test_semdedup_two_level_empty_build_slice_raises(spark, sf_dir):
    from migrator_spark.operators.similarity import semdedup_two_level

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="EMPTY build slice"):
        semdedup_two_level(
            emb, k_coarse=2, k_fine=2, iters=1,
            build_sample_mod=10_000_000_000,
        ).count()


# --- cur10: the release composition's leakage guarantee -----------------------


def test_cur10_train_packing_never_contains_val_group_members(spark, sf_dir):
    from migrator_spark.plans.llmdata import cur10_release_manifest

    rows = cur10_release_manifest(spark, sf_dir).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group"], set()).add(r.split)
    # survivors are one-per-cluster, so every group appears once; the
    # split is a pure function of the group id
    assert all(len(s) == 1 for s in by_group.values())
    for r in rows:
        if r.split == "train":
            assert r.bucket is not None and r.start_offset is not None
        else:
            assert r.bucket is None and r.chunk_id is None


# --- jpeg malformed-input contract, fuzzed ------------------------------------


def test_jpeg_decode_fuzz_never_escapes_error_contract():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=64))
    def fuzz(tail):
        try:
            jpeg_decode(b"\xff\xd8" + tail)
        except (ValueError, NotImplementedError):
            pass  # the module's documented malformed-input contract

    fuzz()


def test_jpeg_decode_fuzz_marker_shaped_inputs():
    # marker-shaped fuzz: valid SOI + a plausible marker tag + a size
    # field that may disagree with the remaining bytes — exercises the
    # declared-size vs internal-layout seams directly
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tags = st.sampled_from([0xDB, 0xC4, 0xC0, 0xDA, 0xDD, 0xFE])

    @settings(max_examples=300, deadline=None)
    @given(tags, st.integers(min_value=0, max_value=70), st.binary(max_size=70))
    def fuzz(tag, size, body):
        payload = b"\xff\xd8\xff" + bytes([tag]) + size.to_bytes(2, "big") + body
        try:
            jpeg_decode(payload)
        except (ValueError, NotImplementedError):
            pass

    fuzz()


# --- ev15 vs a brute-force chain search, randomized ---------------------------


def test_ev15_matches_bruteforce_on_random_streams(spark):
    import datetime as dt
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    truth = {}
    W = 24  # hours — matches the query's 1-day window
    for user in range(120):
        n = rng.randint(1, 12)
        evs = sorted(
            (rng.randint(0, 96), rng.choice(["view", "click", "purchase"]))
            for _ in range(n)
        )
        for h, t in evs:
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                 user, t, 0.0, "{}")
            )
            eid += 1
        # brute force: every (view, click, purchase) chain with
        # non-decreasing times inside [t_view, t_view + W]
        views = [h for h, t in evs if t == "view"]
        clicks = [h for h, t in evs if t == "click"]
        purch = [h for h, t in evs if t == "purchase"]
        if not views:
            continue
        level = 1
        for v in views:
            for c in clicks:
                if v <= c <= v + W:
                    level = max(level, 2)
                    for p in purch:
                        if c <= p <= v + W:
                            level = max(level, 3)
        truth[user] = level
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    import migrator_spark.plans.analytics as an
    from unittest import mock

    with mock.patch.object(an, "load_table", lambda s, d, t: ev):
        got = {
            r.level: r.n_users
            for r in an.ev15_window_funnel(spark, "x").collect()
        }
    want = {}
    for lv in truth.values():
        want[lv] = want.get(lv, 0) + 1
    assert got == want, (got, want)


# --- sim14: the recall curve's contracts --------------------------------------


def test_sim14_recall_monotone_in_probe_count(spark, sf_dir):
    from migrator_spark.plans.llmdata import sim14_multiprobe_recall

    rows = sim14_multiprobe_recall(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, {})[r.n_probe] = r.n_hits
    # probing MORE cells can never lose a hit (probe sets are nested)
    for q, d in by_q.items():
        assert d[1] <= d[2] <= d[4], (q, d)
