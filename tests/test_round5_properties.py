"""Behavioral properties of the late-round-5 operators — the claims
the DuckDB oracles can't state (the oracle proves WHAT was computed
matches; these prove the computation does what the method promises).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from migrator_spark.operators.similarity import semdedup
from migrator_spark.plans import llmdata
from migrator_spark.tables import load_table


def test_dsir_selection_enriches_target_domain(spark, sf_dir):
    # the whole point of importance resampling: the selected slice must
    # look MORE like the target (lang='en') than the raw pool does
    docs = load_table(spark, sf_dir, "documents")
    pool = docs.agg(
        (F.count_if(F.col("lang") == "en") / F.count(F.lit(1))).alias("r")
    ).first()["r"]
    sel = llmdata.cur9_dsir_select(spark, sf_dir).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    got = sel.agg(
        (F.count_if(F.col("lang") == "en") / F.count(F.lit(1))).alias("r")
    ).first()["r"]
    assert got > pool, (got, pool)


def test_dsir_weights_rank_target_docs_higher(spark, sf_dir):
    # mean importance of target-language docs must exceed the others'
    docs = load_table(spark, sf_dir, "documents")
    w = llmdata.ds1_dsir_weights(spark, sf_dir).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = {
        r["is_en"]: r["m"]
        for r in w.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("avg_logratio").alias("m"))
        .collect()
    }
    assert rows[True] > rows[False], rows


def test_semdedup_flags_planted_duplicates(spark):
    # two identical vectors + one near-identical form ONE duplicate
    # clique (cos(base, near) ~ 0.99995 >= tau): every member is
    # flagged, exactly one survives; far-away vectors stay untouched
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    far = [0.0, 1.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, far), (4, [0.0, 0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semdedup(emb, k=2, iters=2, tau=0.99).collect()}
    assert all(out[i]["n_dups"] == 2 for i in (0, 1, 2)), out
    assert sum(out[i]["keep"] for i in (0, 1, 2)) == 1, out
    # vectors with no near-dup partner are always kept
    assert out[3]["keep"] and out[3]["n_dups"] == 0
    assert out[4]["keep"] and out[4]["n_dups"] == 0


def test_semdedup_keep_count_is_one_per_duplicate_clique(spark):
    # a 3-clique of identical vectors keeps exactly one member
    v = [0.5, 0.5, 0.5, 0.5]
    emb = spark.createDataFrame(
        [(i, v) for i in range(3)] + [(9, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = semdedup(emb, k=1, iters=1, tau=0.999)
    kept = out.filter(F.col("keep") & (F.col("n_dups") > 0)).count()
    assert kept == 1, out.orderBy("vec_id").collect()


def test_funnel_counts_are_monotone_nonincreasing(spark, sf_dir):
    from migrator_spark.plans import analytics as an

    rows = {r["step"]: r["n_users"] for r in an.ev11_funnel(spark, sf_dir).collect()}
    assert rows[1] >= rows[2] >= rows[3], rows


def test_retention_cohort_offsets_start_at_zero(spark, sf_dir):
    from migrator_spark.plans import analytics as an

    df = an.fo4_retention_cohorts(spark, sf_dir)
    # every cohort is active in its own first week (offset 0 exists and
    # is the cohort's maximum activity count)
    agg = (
        df.groupBy("cohort_week")
        .agg(
            F.min("week_offset").alias("lo"),
            F.max_by("n_active", -F.col("week_offset")).alias("w0"),
            F.max("n_active").alias("mx"),
        )
        .collect()
    )
    for r in agg:
        assert r["lo"] == 0, r
        assert r["w0"] == r["mx"], r


def test_incremental_semdedup_drops_arrival_matching_corpus(spark):
    from migrator_spark.operators.similarity import semdedup_incremental

    # corpus of two distinct directions; arrivals: one copies an
    # existing vector (dropped, incumbent wins), one is novel (kept)
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    new_ids = emb.filter(F.col("vec_id") >= 10).select("vec_id")
    out = {
        r["vec_id"]: r
        for r in semdedup_incremental(emb, new_ids, k=2, iters=1, tau=0.99).collect()
    }
    assert set(out) == {10, 11}, out  # only the batch is judged
    assert out[10]["n_dups_old"] >= 1 and not out[10]["keep"], out
    assert out[11]["n_dups_old"] == 0 and out[11]["keep"], out


def test_png_decode_all_five_filters():
    # the synthetic round trip (mm7) exercises None/Sub/Up; craft a
    # PNG whose rows use Average and Paeth so the full filter spec is
    # load-bearing somewhere
    import struct
    import zlib

    from migrator_spark.operators.multimodal import _PNG_SIG, png_decode

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    w, h = 8, 4
    rows = [bytes(((5 * x + 11 * y) % 256) for x in range(w)) for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    stream = bytearray()
    prev = bytes(w)
    for y, row in enumerate(rows):
        f = 3 if y % 2 == 0 else 4  # Average / Paeth alternating
        stream.append(f)
        for i in range(w):
            left = row[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            pred = (left + up) >> 1 if f == 3 else paeth(left, up, ul)
            stream.append((row[i] - pred) & 0xFF)
        prev = row
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )
    assert png_decode(png) == (w, h, 1, sum(sum(r) for r in rows))

    # corrupt one IDAT byte -> the CRC check must refuse it
    bad = bytearray(png)
    bad[len(_PNG_SIG) + 12 + 13 + 12 + 8] ^= 0xFF
    import pytest as _pytest

    with _pytest.raises(ValueError):
        png_decode(bytes(bad))


def test_dsir_curation_example_runs_end_to_end(spark, sf_dir, tmp_path):
    # the examples/ script is live code: run its pipeline at test SF
    # and check the budget + packing invariants hold on its outputs
    import importlib.util as ilu
    from pathlib import Path

    spec = ilu.spec_from_file_location(
        "dsir_curation_example",
        Path(__file__).resolve().parent.parent / "examples" / "dsir_curation.py",
    )
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "out")
    mod.run(spark, str(sf_dir), out, budget=2000, seq_len=64)
    sel = spark.read.parquet(f"{out}/selected")
    assert 0 < sel.count() < spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sel.agg(F.sum("n_tokens")).first()[0] <= 2000
    packed = spark.read.parquet(f"{out}/packed")
    # every selected doc is packed exactly once
    assert packed.count() == sel.count()
    assert packed.join(sel, "doc_id").count() == sel.count()


def test_png_roundtrip_property(spark):
    # hypothesis: random tiny images + random per-row filter choices
    # survive the encode(reference) -> png_decode round trip exactly
    import struct
    import zlib

    from hypothesis import given, settings, strategies as st

    from migrator_spark.operators.multimodal import _PNG_SIG, png_decode

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 6),
        st.integers(1, 6),
        st.data(),
    )
    def prop(w, h, data):
        rows = [
            bytes(data.draw(st.integers(0, 255)) for _ in range(w))
            for _ in range(h)
        ]
        stream = bytearray()
        prev = bytes(w)
        for row in rows:
            f = data.draw(st.integers(0, 4))
            stream.append(f)
            for i in range(w):
                left = row[i - 1] if i else 0
                up = prev[i]
                ul = prev[i - 1] if i else 0
                pred = [0, left, up, (left + up) >> 1, paeth(left, up, ul)][f]
                stream.append((row[i] - pred) & 0xFF)
            prev = row
        png = (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(stream)))
            + chunk(b"IEND", b"")
        )
        assert png_decode(png) == (w, h, 1, sum(sum(r) for r in rows))

    prop()


def test_portable_hll_within_error_bound(spark, sf_dir):
    # verified-approximate: the portable HLL's estimate must land
    # within ~3 standard errors (1.04/sqrt(256) ~ 6.5% -> 20% at 3σ,
    # and the linear-counting branch is far tighter) of the exact
    # distinct count, per group
    from migrator_spark.operators.quality import portable_hll
    from migrator_spark.tables import load_table

    ev = load_table(spark, str(sf_dir), "events")
    est = {
        r["event_type"]: r["hll_estimate"]
        for r in portable_hll(ev, "user_id", "event_type").collect()
    }
    exact = {
        r["event_type"]: r["x"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, x in exact.items():
        assert abs(est[k] - x) <= max(0.2 * x, 3.0), (k, est[k], x)
