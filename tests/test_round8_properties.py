"""Round-8 property pins for the ADVICE r7 fixes: (1) portable_bloom's
probe join is null-safe WITHOUT a collidable sentinel; (2) gemm_topk's
zero-norm corpus rows never evict real candidates, and with ANSI off
the GEMM path matches the pure-Catalyst path bit-for-bit (NULL cosine
rows rank last in both)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators.quality import portable_bloom
from migrator_spark.operators.similarity import gemm_topk, pairwise_topk_join


def test_bloom_null_and_sentinel_literal_probes_dont_collide(spark):
    """ADVICE r7 #1: a probe set containing BOTH NULL and the literal
    "\\x00null" used to coalesce onto one join key — the hit count
    doubled to 2k and `hits == k` reported both as NON-members even
    when genuinely inserted. The null-safe groupBy + eqNullSafe join
    keeps them distinct."""
    keys = spark.createDataFrame(
        [("g", None), ("g", "\x00null"), ("g", "a")], "grp string, k string"
    )
    probes = spark.createDataFrame(
        [("g", None), ("g", "\x00null"), ("g", "a"), ("g", "absent-key")],
        "grp string, pk string",
    )
    out = {
        r["pk"]: r["member"]
        for r in portable_bloom(
            keys, probes, key_col="k", group_col="grp", probe_col="pk"
        ).collect()
    }
    assert out[None] is True  # inserted NULL: member
    assert out["\x00null"] is True  # inserted literal sentinel: member
    assert out["a"] is True
    assert len(out) == 4  # the two colliding probes stay separate rows


def test_gemm_topk_matches_catalyst_with_zero_corpus_row_ansi_off(
    spark, sf_dir
):
    """ADVICE r7 #2: with ANSI off, Catalyst cosine on a zero-norm
    corpus row yields NULL (no error); the old +inf marking let those
    rows evict real candidates from the pruner. Now they are appended
    as extra candidates, score NULL at rescore, sort last (desc =>
    NULLS LAST), and the GEMM path equals pairwise_topk_join exactly."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    zero_rows = spark.createDataFrame(
        [(100000 + i, [0.0] * dim, 0) for i in range(12)],
        "vec_id long, embedding array<float>, label int",
    )
    with_zero = emb.unionByName(zero_rows)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        pure = {
            (r["q_id"], r["rank"]): (r["vec_id"], r["cos_sim"])
            for r in pairwise_topk_join(with_zero, queries, k=4).collect()
        }
        gemm = {
            (r["q_id"], r["rank"]): (r["vec_id"], r["cos_sim"])
            for r in gemm_topk(
                with_zero, queries, k=4, margin=8
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert gemm == pure
    # 12 zero rows > margin=8: under the old +inf marking they would
    # have filled every per-batch candidate slot and evicted the true
    # top-k; equality above proves no eviction
    assert all(v[1] is not None for v in gemm.values())


def test_score_two_level_nprobe1_is_bit_identical(spark, sf_dir):
    """n_probe=1 must be the original single-probe path bit-for-bit —
    the graded sd5 contract is untouched by the new knob."""
    from migrator_spark.operators.similarity import (
        fit_two_level,
        score_against_two_level,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pts = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    coarse, fine, asg1 = fit_two_level(pts, 3, 3, 1)
    a = {
        r["vec_id"]: (r["cell"], r["_cs"], r["_nrm"])
        for r in score_against_two_level(
            pts, coarse, fine, 3, asg1=asg1
        ).collect()
    }
    b = {
        r["vec_id"]: (r["cell"], r["_cs"], r["_nrm"])
        for r in score_against_two_level(
            pts, coarse, fine, 3, n_probe=1
        ).collect()
    }
    assert a == b


def test_score_two_level_multiprobe_never_worse(spark, sf_dir):
    """Multi-probe monotonicity on the SCORING seam: probing more
    coarse cells can only find a nearer (cell, sub) reference, so the
    cosine to the assigned fine centroid is >= single-probe's for every
    row, and at n_probe = k_coarse the hierarchy error is gone (the
    chosen fine centroid is the global argmin over all subs)."""
    from migrator_spark.operators.similarity import (
        fit_two_level,
        score_against_two_level,
        _sq_l2,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(400)
    pts = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)
    coarse, fine, asg1 = fit_two_level(pts, 4, 3, 1)
    s1 = score_against_two_level(pts, coarse, fine, 3, asg1=asg1)
    s4 = score_against_two_level(pts, coarse, fine, 3, n_probe=4)
    # compare the squared distance to each run's assigned fine centroid
    f2 = fine.select(
        ((F.col("cell") * 3) + F.col("sub")).cast("long").alias("cell"),
        F.col("c"),
    )
    d1 = {
        r["vec_id"]: r["d"]
        for r in s1.join(f2, "cell")
        .select("vec_id", _sq_l2(F.col("v"), F.col("c")).alias("d"))
        .collect()
    }
    d4 = {
        r["vec_id"]: r["d"]
        for r in s4.join(f2, "cell")
        .select("vec_id", _sq_l2(F.col("v"), F.col("c")).alias("d"))
        .collect()
    }
    assert set(d1) == set(d4)
    assert all(d4[i] <= d1[i] + 1e-12 for i in d1)
    assert any(d4[i] < d1[i] - 1e-12 for i in d1), (
        "n_probe=4 found no better assignment anywhere — "
        "multi-probe wiring is a no-op on this corpus?"
    )


def test_ivf_batch_topk_full_probe_equals_exact(spark, sf_dir):
    """At n_probe = k (probe every cell) the IVF search IS the exact
    brute-force search: equality against pairwise_topk_join pins both
    the probe-set builder and the pruned-scan scoring path."""
    from migrator_spark.operators.similarity import (
        _fit_centroids,
        _assign_cells,
        ivf_batch_topk,
        pairwise_topk_join,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pts = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cents = _fit_centroids(pts, 4, 1, "vec_id").localCheckpoint(eager=True)
    assign = _assign_cells(pts, cents, "vec_id").select("vec_id", "cell")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    got = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["cos_sim"])
        for r in ivf_batch_topk(
            emb.join(assign, "vec_id"), queries, cents, n_probe=4, k=5
        ).collect()
    }
    exact = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["cos_sim"])
        for r in pairwise_topk_join(emb, queries, k=5).collect()
    }
    assert got == exact


def test_multiprobe_cells_rank_and_ties(spark):
    """The probe builder's tie-break is (d asc, cell asc) — two
    equidistant centroids must probe the LOWER cell first."""
    from migrator_spark.operators.similarity import multiprobe_cells

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, -1.0]), (3, [5.0, 5.0])],
        "cell int, c array<double>",
    )
    q = spark.createDataFrame([(7, [0.0, 0.0])], "q_id long, qv array<double>")
    # cells 0,1,2 all at distance 1; cell 3 far — top-2 must be {0, 1}
    got = sorted(
        r["cell"] for r in multiprobe_cells(q, cents, 2).collect()
    )
    assert got == [0, 1]


def test_shared_shingle_index_outputs_bit_identical(spark, sf_dir):
    """VERDICT r7 #4's contract: consuming the shared materialized
    shingle index must leave every family member's output BIT-IDENTICAL
    to its self-built form (the index is the same relation, projected)."""
    from migrator_spark.operators import dedup as dd
    from migrator_spark.operators import textops as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = dd.shingle_index(docs, attrs=["lang", "source"]).localCheckpoint(
        eager=True
    )

    def rows(df):
        return sorted(map(repr, (tuple(r) for r in df.collect())))

    assert rows(
        dd.ngram_jaccard_pairs(
            docs, ["lang", "source"], threshold=0.2, index=idx
        )
    ) == rows(dd.ngram_jaccard_pairs(docs, ["lang", "source"], threshold=0.2))
    assert rows(
        dd.containment_pairs(docs, ["lang"], threshold=0.5, index=idx)
    ) == rows(dd.containment_pairs(docs, ["lang"], threshold=0.5))
    assert rows(
        dd.edit_distance_pairs(
            docs, ["lang"], max_dist=40, min_shared=2, index=idx
        )
    ) == rows(dd.edit_distance_pairs(docs, ["lang"], max_dist=40, min_shared=2))
    assert rows(
        tx.similar_docs_topk(docs, query_doc_id=0, k=10, index=idx)
    ) == rows(tx.similar_docs_topk(docs, query_doc_id=0, k=10))


def test_ivf_pq_composition_takes_nprobe(spark, sf_dir):
    """VERDICT r7 #3's sim10 half: the IVF+PQ composition is probe-set
    parameterized — multiprobe_cells prunes the candidate slice for the
    ADC scan, nested probe sets give nested candidates, and the ADC
    result over the n_probe=2 slice equals the ADC scan restricted to
    exactly those cells (same codebooks trained on the full corpus,
    as a served index would)."""
    from migrator_spark.operators.similarity import (
        _assign_cells,
        _fit_centroids,
        multiprobe_cells,
        pq_adc_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    pts = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cents = _fit_centroids(pts, 4, 1, "vec_id").localCheckpoint(eager=True)
    assign = _assign_cells(pts, cents, "vec_id").select("vec_id", "cell")
    q = pts.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("q_id"), F.col("v").alias("qv")
    )
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )

    def cand(n_probe):
        probes = multiprobe_cells(q, cents, n_probe).select("cell")
        return (
            emb.filter(F.col("vec_id") != 0)
            .join(assign, "vec_id")
            .join(F.broadcast(probes), "cell", "leftsemi")
            .select("vec_id", "embedding")
        )

    c1 = {r["vec_id"] for r in cand(1).select("vec_id").collect()}
    c2 = {r["vec_id"] for r in cand(2).select("vec_id").collect()}
    assert c1 < c2  # nested probe sets -> strictly nested candidates

    got = pq_adc_topk(
        cand(2), query, dim=dim, m=2, k=4, topk=5,
        train=emb.filter(F.col("vec_id") != 0),
    ).collect()
    assert {r["vec_id"] for r in got} <= c2 and len(got) == 5
    # determinism: re-running the composition reproduces it exactly
    again = pq_adc_topk(
        cand(2), query, dim=dim, m=2, k=4, topk=5,
        train=emb.filter(F.col("vec_id") != 0),
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_shared_artifact_caches_key_by_sf_dir(spark):
    """The shared materialized artifacts (shingle index, MinHash pair
    graph, flat quantizer) are keyed by (applicationId, sf_dir): one
    session serving two scale factors must never hand sf0.1's artifact
    to an sf0.001 query — a wrong key here would silently poison the
    driver's correctness run from a preceding bench run."""
    import migrator_spark.plans.llmdata as L

    a, b = "/root/testdata/sf0.001", "/root/testdata/sf0.1"
    pa = L._shared_minhash_pairs(spark, a)
    pb = L._shared_minhash_pairs(spark, b)
    assert pa is not pb
    ia = L._shared_shingle_index(spark, a)
    ib = L._shared_shingle_index(spark, b)
    assert ia is not ib
    assert ib.count() > ia.count()  # sf0.1's corpus is strictly larger
    # repeated calls hit the cache (same object back)
    assert L._shared_minhash_pairs(spark, b) is pb
    qa = L._shared_flat_quantizer(spark, a)
    assert L._shared_flat_quantizer(spark, a) is qa


def test_window_funnel_n_matches_brute_force(spark):
    """The N-step suffix-min recurrence (window_funnel_n) against a
    brute-force chain search on random event streams: for every user,
    level = max over step-1 events t1 of the deepest chain
    t1 <= t2 <= ... <= tk <= t1 + W with the step types in order."""
    import random
    from datetime import datetime, timedelta

    from migrator_spark.plans.analytics import window_funnel_n

    rng = random.Random(80817)
    steps = ("signup", "view", "click", "purchase")
    W = timedelta(days=1)
    t0 = datetime(2024, 1, 1)
    rows = []
    per_user = {}
    for uid in range(40):
        evs = []
        for _ in range(rng.randint(1, 14)):
            ts = t0 + timedelta(minutes=rng.randint(0, 3000))
            et = rng.choice(steps + ("error",))
            evs.append((ts, et))
            rows.append((len(rows), ts, uid, et, 0.0, "{}"))
        per_user[uid] = sorted(e for e in evs if e[1] in steps)

    def brute(evs):
        best = 0
        n = len(evs)

        def deepest(i, k):  # deepest chain from evs[i] matching steps[k:]
            if k == len(steps):
                return 0
            got = 0
            for j in range(i, n):
                if evs[j][1] == steps[k] and evs[j][0] >= evs[i][0]:
                    got = max(got, 1 + deepest(j, k + 1))
            return got

        for i, (ts, et) in enumerate(evs):
            if et != steps[0]:
                continue
            # chain search bounded by the window from THIS start
            within = [e for e in evs if ts <= e[0] <= ts + W]

            def d2(pos, k, lo):
                if k == len(steps):
                    return 0
                got = 0
                for j in range(len(within)):
                    if within[j][1] == steps[k] and within[j][0] >= lo:
                        got = max(got, 1 + d2(j, k + 1, within[j][0]))
                return got

            best = max(best, 1 + d2(0, 1, ts))
        return best

    want = {}
    for uid, evs in per_user.items():
        lv = brute(evs)
        if lv > 0:
            want[lv] = want.get(lv, 0) + 1

    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["level"]: r["n_users"] for r in window_funnel_n(ev, steps).collect()
    }
    assert got == want, (got, want)


def test_streaming_funnel_4step_matches_batch(spark, sf_dir, tmp_path):
    """The generalized O(N)-state automaton at N=4: the events table in
    three time-ordered micro-batches lands every user on the batch
    ev17 level distribution."""
    import time as _time

    from migrator_spark.plans.analytics import EV17_STEPS, ev17_window_funnel4
    from migrator_spark.streaming.streams import streaming_window_funnel

    from migrator_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    batch = {
        r["level"]: r["n_users"]
        for r in ev17_window_funnel4(spark, sf_dir).collect()
    }
    sdir = str(tmp_path / "stream")
    cuts = ("2024-01-11", "2024-01-21")
    parts = [
        events.filter(F.col("ts") < cuts[0]),
        events.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        events.filter(F.col("ts") >= cuts[1]),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(sdir)
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    q = (
        streaming_window_funnel(stream, steps=EV17_STEPS)
        .writeStream.format("memory")
        .queryName("funnel4_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    final = {}
    for r in spark.sql("SELECT * FROM funnel4_out").collect():
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["level"])
    dist = {}
    for lv in final.values():
        dist[lv] = dist.get(lv, 0) + 1
    assert dist == batch, (dist, batch)


def test_window_funnel_n_at_3_equals_ev15(spark, sf_dir):
    """The generalized builder at N=3 must reproduce the hand-built
    (graded) ev15 exactly — same steps, same window, same output."""
    from migrator_spark.plans.analytics import ev15_window_funnel, window_funnel_n
    from migrator_spark.tables import load_table

    want = {
        (r["level"], r["n_users"])
        for r in ev15_window_funnel(spark, sf_dir).collect()
    }
    got = {
        (r["level"], r["n_users"])
        for r in window_funnel_n(
            load_table(spark, sf_dir, "events"),
            ("view", "click", "purchase"),
        ).collect()
    }
    assert got == want
