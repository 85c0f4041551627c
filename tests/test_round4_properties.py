"""Property tests for the round-4 operators: semantic invariants on
constructed inputs that the per-query oracles (one fixed corpus) can't
express — planted duplicates are found exactly, session boundaries
land exactly at the gap threshold, epoch caps bind, and the similarity
probe ranks a verbatim copy first."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from migrator_spark.operators.dedup import dup_spans
from migrator_spark.operators.mixture import epoch_plan
from migrator_spark.operators.textops import similar_docs_topk

DOC_SCHEMA = "doc_id long, text string"


def test_dup_spans_finds_planted_span_and_merges_islands(spark):
    """A 10-word block planted verbatim in two documents must surface in
    BOTH as one maximal span covering exactly the planted words; a doc
    with no 8-word overlap must not appear."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [
            (1, f"a b c d e {shared} f g h i j"),
            (2, f"{shared} zz yy xx ww vv uu tt ss"),
            (3, "p q r s t u v w x y z"),  # no shared 8-gram
        ],
        DOC_SCHEMA,
    )
    got = {
        r["doc_id"]: r for r in dup_spans(docs, window_words=8).collect()
    }
    assert set(got) == {1, 2}
    # doc 1: shared block occupies words 6..15 -> windows j=6..8 merge
    # into one island spanning words 6..15
    assert got[1]["span_start_word"] == 6 and got[1]["span_end_word"] == 15
    assert got[1]["n_windows"] == 3
    # doc 2: block at words 1..10 -> windows j=1..3, span 1..10
    assert got[2]["span_start_word"] == 1 and got[2]["span_end_word"] == 10


def test_dup_spans_ignores_within_doc_repetition(spark):
    """A document repeating ITS OWN 8-gram (internal repetition) is not
    cross-document duplication and must produce no span."""
    block = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = spark.createDataFrame(
        [(1, f"{block} mid {block}"), (2, "totally different words here x y z q")],
        DOC_SCHEMA,
    )
    assert dup_spans(docs, window_words=8).count() == 0


def test_sessionize_boundary_exactly_at_gap(spark, sf_dir):
    """Events exactly at the 30-min gap stay in-session (> threshold
    splits, == does not); counts and indices follow."""
    from migrator_spark.plans.analytics import SESSION_GAP_US, ev7_sessionize

    t0 = datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        (1, 100, t0),
        (2, 100, t0 + timedelta(minutes=30)),          # == gap: same session
        (3, 100, t0 + timedelta(minutes=60, seconds=1)),  # > gap: new session
        (4, 200, t0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    import migrator_spark.plans.analytics as an
    import migrator_spark.tables as tables

    orig = tables.load_table
    try:
        tables_patch = lambda spark_, sf, name: ev if name == "events" else orig(spark_, sf, name)
        an.load_table = tables_patch
        got = {
            (r["user_id"], r["session_idx"]): r["n_events"]
            for r in ev7_sessionize(spark, sf_dir).collect()
        }
    finally:
        an.load_table = orig
    assert got == {(100, 1): 2, (100, 2): 1, (200, 1): 1}
    assert SESSION_GAP_US == 30 * 60 * 1_000_000


def test_epoch_plan_cap_binds_and_budget_never_exceeded(spark):
    """A tiny high-weight source hits the max_epochs cap; uncapped
    sources get epochs proportional to budget*weight/tokens; planned
    tokens never exceed epochs*tokens."""
    docs = spark.createDataFrame(
        [(i, "w " * 10, "big") for i in range(100)]
        + [(1000, "w " * 10, "tiny")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in epoch_plan(docs, token_budget=2_000, max_epochs=4.0).collect()}
    assert got["tiny"]["epochs"] == 4.0  # cap binds for the tiny source
    assert got["big"]["epochs"] < 4.0
    for r in got.values():
        assert r["planned_tokens"] <= r["epochs"] * r["tokens"] + 1e-9


def test_similar_docs_ranks_verbatim_copy_first(spark):
    """An exact copy of the query doc has Jaccard 1.0 and must rank
    first; a disjoint doc never appears."""
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),   # copy
            (2, "the quick brown fox jumps over a sleepy cat"),   # partial
            (3, "completely unrelated words only here now"),      # disjoint
        ],
        DOC_SCHEMA,
    )
    got = similar_docs_topk(docs, query_doc_id=0, k=3, shingle_k=2).collect()
    assert got[0]["doc_id"] == 1 and got[0]["jaccard"] == 1.0
    ids = [r["doc_id"] for r in got]
    assert 3 not in ids
    # descending jaccard, deterministic
    assert [r["jaccard"] for r in got] == sorted(
        (r["jaccard"] for r in got), reverse=True
    )


def test_remove_dup_spans_cuts_planted_block_keeps_unique_prose(spark):
    """The planted shared block disappears from both docs; every word
    outside it survives in order; a span-free doc passes through as its
    normalized word stream with zero removals."""
    from migrator_spark.operators.dedup import remove_dup_spans

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} epsilon zeta eta theta iota kappa"),
            (3, "Unique   Words Only in THIS doc right here"),
        ],
        DOC_SCHEMA,
    )
    got = {r["doc_id"]: r for r in remove_dup_spans(docs, window_words=8).collect()}
    assert got[1]["clean_text"] == "alpha beta gamma delta"
    assert got[1]["n_removed_words"] == 8
    assert got[2]["clean_text"] == "epsilon zeta eta theta iota kappa"
    assert got[3]["clean_text"] == "unique words only in this doc right here"
    assert got[3]["n_removed_words"] == 0


def _bmp_bytes(width: int, height: int) -> bytes:
    # minimal 24-bit BMP, rows padded to 4 bytes — a real, valid file
    import struct

    row = width * 3
    pad = (4 - row % 4) % 4
    pixels = b"".join(
        b"".join(bytes([(x + y) % 256, x % 256, y % 256]) for x in range(width))
        + b"\x00" * pad
        for y in range(height)
    )
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + dib + pixels


def _wav_bytes(seconds: float, rate: int = 8000, channels: int = 1) -> bytes:
    import struct

    n_samples = int(seconds * rate) * channels
    data = struct.pack("<" + "h" * n_samples, *((i * 37) % 8191 - 4096 for i in range(n_samples)))
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_media_parses_real_bmp_and_wav(spark):
    """The decode step is REAL for stdlib-parseable formats: actual BMP
    and RIFF/WAVE files built byte-by-byte round-trip through the
    Arrow mapInPandas decoder with correct dimensions / audio params;
    unknown payloads take the marked stub fallback."""
    from migrator_spark.operators.multimodal import decode_media

    rows = [
        (1, _bmp_bytes(17, 9)),
        (2, _wav_bytes(0.5, rate=8000, channels=1)),
        (3, _wav_bytes(0.25, rate=44100, channels=2)),
        (4, b"\x89PNG\r\n\x1a\n not actually parseable here"),
    ]
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_media(payloads).collect()}
    assert got[1]["media_type"] == "image/bmp"
    assert (got[1]["width"], got[1]["height"]) == (17, 9)
    assert got[2]["media_type"] == "audio/wav"
    assert (got[2]["channels"], got[2]["sample_rate"], got[2]["duration_ms"]) == (1, 8000, 500)
    assert (got[3]["channels"], got[3]["sample_rate"], got[3]["duration_ms"]) == (2, 44100, 250)
    assert got[4]["media_type"] == "unknown" and got[4]["width"] is not None

    import pytest

    with pytest.raises(Exception, match="PIL/ffmpeg"):
        decode_media(
            spark.createDataFrame([(9, b"zzz")], "doc_id long, payload binary"),
            strict=True,
        ).collect()
