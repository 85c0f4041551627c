"""Round-9 late-data policy for the order-DEPENDENT ingest lanes
(VERDICT r8 #6): semantic_ingest_stream and continuous_packing_stream
fold in arrival order by semantics (incumbents win; offsets extend).
These tests grade that contract instead of assuming it:

1. SHUFFLED-ARRIVAL PARITY — under an adversarial arrival slicing the
   stream's output equals the batch fold of that exact arrival
   sequence (the contract), and the divergence against the EVENT-TIME
   fold is COUNTED, not silently passed over.
2. ENFORCEMENT — wiring watermark_reorder_buffer in front (two-query
   file-handoff topology, constant key = a globally-ordered lane)
   restores the event-time fold bit-for-bit from the same shuffled
   arrival.
3. PACKING invariants under arrival reorder — every doc exactly once,
   per-bucket tilings contiguous, per-bucket totals arrival-order
   INVARIANT, while start offsets measurably move (the counted
   divergence).
"""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import functions as F

from migrator_spark.tables import load_table


def _sd3_fixture(spark, sf_dir):
    from migrator_spark.operators.similarity import (
        _fit_centroids,
        score_against_centroids,
    )
    from migrator_spark.plans.llmdata import (
        EMB_DIM,
        KMEANS_ITERS,
        KMEANS_K,
        SD1_TAU,
        SD3_BOUNDS,
    )

    emb = load_table(spark, str(sf_dir), "embeddings")
    pts = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cents = _fit_centroids(
        pts.filter(F.col("vec_id") < SD3_BOUNDS[0]),
        KMEANS_K,
        KMEANS_ITERS,
        "vec_id",
    ).localCheckpoint(eager=True)
    scored = score_against_centroids(pts, cents, "vec_id")
    incumbents = scored.filter(
        F.col("vec_id") < SD3_BOUNDS[0]
    ).localCheckpoint(eager=True)
    return emb, cents, incumbents, SD3_BOUNDS, SD1_TAU, EMB_DIM


DEC_COLS = ["vec_id", "cell", "batch_id", "n_dups_old", "n_dups_new", "keep"]


def _write_slices(spark, slices, in_dir):
    """One parquet file per arrival slice, order pinned by explicitly
    stamped mtimes (the st6 discipline — no sleeps)."""
    import shutil

    os.makedirs(in_dir, exist_ok=True)
    t0 = _time.time() - 120.0
    for i, sl in enumerate(slices):
        stage = f"{in_dir}.__stage{i}"
        sl.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(in_dir, f"batch-{i:05d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (t0 + 10.0 * i, t0 + 10.0 * i))
        shutil.rmtree(stage, ignore_errors=True)


def _arrival_fold(spark, slices, cents, incumbents, tau, dim):
    """The batch fold of an EXPLICIT arrival sequence — what the
    stream is contracted to equal under that arrival order."""
    from migrator_spark.operators.similarity import (
        _judge_scored_batch,
        score_against_centroids,
    )

    kept, out = incumbents, []
    for i, sl in enumerate(slices):
        pts = sl.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "v"
            ),
        )
        scored = score_against_centroids(pts, cents, "vec_id")
        dec = _judge_scored_batch(scored, kept, tau, dim, "vec_id").withColumn(
            "batch_id", F.lit(i).cast("long")
        )
        out.extend(sorted(map(tuple, dec.select(*DEC_COLS).collect())))
        kept = kept.unionByName(
            scored.join(
                dec.filter(F.col("keep")).select("vec_id"), "vec_id", "leftsemi"
            )
        ).localCheckpoint(eager=True)
    return sorted(out)


def test_semantic_ingest_shuffled_arrival_is_the_arrival_fold(
    spark, sf_dir, tmp_path
):
    from migrator_spark.operators.similarity import semdedup_fold
    from migrator_spark.plans.llmdata import KMEANS_ITERS, KMEANS_K
    from migrator_spark.streaming.streams import semantic_ingest_stream

    emb, cents, incumbents, bounds, tau, dim = _sd3_fixture(spark, sf_dir)
    arrivals = emb.filter(F.col("vec_id") >= bounds[0])
    # adversarial slicing: the HIGH-id half arrives before the low-id
    # half, so event order runs backwards across the batch boundary
    slices = [
        arrivals.filter(F.col("vec_id") >= bounds[1]),
        arrivals.filter(F.col("vec_id") < bounds[1]),
    ]
    in_dir = str(tmp_path / "in")
    st_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("st", "out", "ck"))
    _write_slices(spark, slices, in_dir)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = semantic_ingest_stream(
        spark, stream, incumbents, cents, st_dir, ckpt, out_dir,
        tau=tau, dim=dim,
    )
    assert q.awaitTermination(180)
    got = sorted(
        map(
            tuple,
            spark.read.option("basePath", out_dir)
            .parquet(out_dir)
            .select(*DEC_COLS)
            .collect(),
        )
    )
    # the contract: stream == fold of the ARRIVAL sequence
    want = _arrival_fold(spark, slices, cents, incumbents, tau, dim)
    assert got == want and len(got) > 0

    # the divergence vs the EVENT-TIME fold is real and counted — the
    # reason an order-sensitive consumer must either accept
    # arrival-order semantics or enforce order upstream (test below)
    ordered = {
        r["vec_id"]: r["keep"]
        for r in semdedup_fold(
            emb, list(bounds), k=KMEANS_K, iters=KMEANS_ITERS, tau=tau,
            dim=dim,
        ).collect()
    }
    got_keep = {t[0]: t[5] for t in got}
    n_flipped = sum(
        1 for v, k in got_keep.items() if ordered[v] != k
    )
    assert set(got_keep) == set(ordered)
    assert n_flipped > 0, "slicing chosen to diverge — update if corpus changed"


def test_semantic_ingest_reorder_buffer_restores_event_time_fold(
    spark, sf_dir, tmp_path
):
    """The enforcement option, end-to-end: the same backwards arrival
    goes through watermark_reorder_buffer (constant key — a globally
    ordered lane; ts synthesized from vec_id; far-future sentinels
    flush the tail, the documented production heartbeat), the ordered
    hand-off feeds semantic_ingest_stream, and the decisions equal the
    EVENT-TIME fold — the outcome the shuffled arrival above measurably
    diverges from."""
    from migrator_spark.operators.similarity import semdedup_fold
    from migrator_spark.plans.llmdata import KMEANS_ITERS, KMEANS_K
    from migrator_spark.streaming.streams import (
        semantic_ingest_stream,
        watermark_reorder_buffer,
    )

    emb, cents, incumbents, bounds, tau, dim = _sd3_fixture(spark, sf_dir)
    span_s = 1000  # vec ids fit within; lateness covers the full shuffle
    with_ts = emb.filter(F.col("vec_id") >= bounds[0]).select(
        "vec_id",
        "embedding",
        F.lit(0).alias("_k"),
        F.expr(
            "timestampadd(SECOND, vec_id, TIMESTAMP '2024-01-01 00:00:00')"
        ).alias("_ts"),
    )
    sentinel = spark.range(2).select(
        (F.lit(-1) - F.col("id")).alias("vec_id"),
        F.expr("array_repeat(CAST(0.0 AS FLOAT), 64)").alias("embedding"),
        F.lit(0).alias("_k"),
        F.expr(
            "timestampadd(SECOND, CAST(id AS INT) + 100000,"
            " TIMESTAMP '2024-01-01 00:00:00')"
        ).alias("_ts"),
    )
    slices = [
        with_ts.filter(F.col("vec_id") >= bounds[1]),
        with_ts.filter(F.col("vec_id") < bounds[1]),
        sentinel,  # maturity pusher: flushes the buffered tail
    ]
    in_dir, mid = str(tmp_path / "in"), str(tmp_path / "ordered")
    st_dir, out_dir = str(tmp_path / "st"), str(tmp_path / "out")
    _write_slices(spark, slices, in_dir)

    stream1 = (
        spark.readStream.schema(slices[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q1 = (
        watermark_reorder_buffer(
            stream1, "_k", "_ts", max_lateness_micros=span_s * 1_000_000
        )
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(mid)
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    assert q1.awaitTermination(180)
    ordered_handoff = spark.read.parquet(mid)
    # every real arrival released (sentinels flushed them), none dropped
    assert (
        ordered_handoff.filter(F.col("vec_id") >= 0).count()
        == with_ts.count()
    )
    assert ordered_handoff.agg(F.max("late_dropped")).first()[0] == 0

    stream2 = (
        spark.readStream.schema(ordered_handoff.schema)
        .parquet(mid)
        .filter(F.col("vec_id") >= 0)  # drop the heartbeat sentinels
        .select("vec_id", "embedding")
    )
    q2 = semantic_ingest_stream(
        spark, stream2, incumbents, cents, st_dir,
        str(tmp_path / "ck2"), out_dir, tau=tau, dim=dim,
    )
    assert q2.awaitTermination(180)
    got = sorted(
        map(
            tuple,
            spark.read.option("basePath", out_dir)
            .parquet(out_dir)
            .select("vec_id", "cell", "n_dups_old", "n_dups_new", "keep")
            .collect(),
        )
    )
    # one fully-ordered release => the event-time fold with a single
    # arriving batch
    want = sorted(
        map(
            tuple,
            semdedup_fold(
                emb, [bounds[0]], k=KMEANS_K, iters=KMEANS_ITERS, tau=tau,
                dim=dim,
            )
            .select("vec_id", "cell", "n_dups_old", "n_dups_new", "keep")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_packing_stream_reorder_keeps_tiling_moves_offsets(spark, tmp_path):
    """Arrival-order contract for the packing lane, measured: the same
    60 docs arrive as wave A then B, and (separately) B then A. Both
    runs must produce a VALID incremental packing equal to the fold of
    their own arrival order — every doc exactly once, every bucket a
    contiguous tiling, per-bucket token totals IDENTICAL across orders
    — while the start offsets measurably move (the counted divergence
    that makes the order-dependence visible instead of assumed)."""
    from migrator_spark.operators.packing import pack_sequences
    from migrator_spark.streaming.streams import continuous_packing_stream

    schema = "doc_id long, text string"
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(3 + i % 5)))
        for i in range(60)
    ]
    wave_a = [r for r in rows if r[0] < 30]
    wave_b = [r for r in rows if r[0] >= 30]

    def run(order, tag):
        in_dir = str(tmp_path / f"in_{tag}")
        man, st, ck = (
            str(tmp_path / f"{d}_{tag}") for d in ("man", "st", "ck")
        )
        _write_slices(
            spark, [spark.createDataFrame(w, schema) for w in order], in_dir
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = continuous_packing_stream(
            spark, stream, man, st, ck, token_budget=16, n_buckets=4
        )
        assert q.awaitTermination(180)
        return {
            r["doc_id"]: (r["bucket"], r["start_offset"], r["n_tokens"])
            for r in spark.read.parquet(man).collect()
        }

    ab = run([wave_a, wave_b], "ab")
    ba = run([wave_b, wave_a], "ba")

    # the contract: each run equals the fold of its own arrival order
    def fold(order):
        totals, out = None, {}
        for w in order:
            packed = pack_sequences(
                spark.createDataFrame(w, schema), 16, n_buckets=4,
                totals=totals,
            ).localCheckpoint(eager=True)
            for r in packed.collect():
                out[r["doc_id"]] = (
                    r["bucket"], r["start_offset"], r["n_tokens"],
                )
            ends = packed.groupBy("bucket").agg(
                F.max(F.col("start_offset") + F.col("n_tokens")).alias(
                    "tokens_packed"
                )
            )
            totals = (
                ends
                if totals is None
                else ends.unionByName(
                    totals.join(ends.select("bucket"), "bucket", "left_anti")
                )
            ).localCheckpoint(eager=True)
        return out

    assert ab == fold([wave_a, wave_b])
    assert ba == fold([wave_b, wave_a])

    # invariants under reorder: same doc set, same bucket per doc (hash
    # of the doc id), same per-bucket totals
    assert set(ab) == set(ba) == {r[0] for r in rows}
    assert all(ab[d][0] == ba[d][0] and ab[d][2] == ba[d][2] for d in ab)

    def totals_of(m):
        t: dict = {}
        for b, off, n in m.values():
            t[b] = max(t.get(b, 0), off + n)
        return t

    assert totals_of(ab) == totals_of(ba)
    # ...and the counted divergence: offsets DID move for some docs
    assert sum(1 for d in ab if ab[d][1] != ba[d][1]) > 0
