"""Property test: incremental top-k maintenance is exact — merging the
retained top-k with a scored arriving batch equals recomputing top-k
over the full corpus, for any split and any score ties."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from migrator_spark.operators.similarity import cosine_topk, incremental_topk

DIM = 4
VEC = st.lists(
    st.integers(min_value=-3, max_value=3).map(float), min_size=DIM, max_size=DIM
).filter(lambda v: any(x != 0.0 for x in v))
CORPUS = st.lists(VEC, min_size=1, max_size=20)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(corpus=CORPUS, qv=VEC, split=st.integers(min_value=0, max_value=20), k=st.integers(min_value=1, max_value=6))
def test_incremental_topk_equals_full(spark, corpus, qv, split, k):
    split = min(split, len(corpus))
    rows = [(i, v) for i, v in enumerate(corpus)]
    schema = "vec_id long, embedding array<double>"
    full = spark.createDataFrame(rows, schema)
    query = spark.createDataFrame([(qv,)], "qe array<double>")

    expected = [tuple(r) for r in cosine_topk(full, query, k=k).collect()]

    old = spark.createDataFrame(rows[:split], schema)
    new = spark.createDataFrame(rows[split:], schema)
    old_topk = cosine_topk(old, query, k=k)
    got = [tuple(r) for r in incremental_topk(old_topk, new, query, k=k).collect()]
    assert got == expected


def test_duplicate_clusters_chain_and_islands(spark):
    """Worst-case component shapes for min-label propagation: a long
    chain (diameter = n-1, needs the full iteration count), a triangle,
    and an isolated pair — clusters must be exact transitive closures
    labeled by min member."""
    from migrator_spark.operators.dedup import duplicate_clusters

    chain = [(i, i + 1) for i in range(10, 20)]          # 10-…-20
    triangle = [(1, 2), (2, 3), (1, 3)]
    island = [(100, 101)]
    pairs = spark.createDataFrame(
        chain + triangle + island, "doc_a long, doc_b long"
    )
    got = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in duplicate_clusters(pairs).collect()
    }
    want = (
        {(i, 10, 11) for i in range(10, 21)}
        | {(i, 1, 3) for i in (1, 2, 3)}
        | {(i, 100, 2) for i in (100, 101)}
    )
    assert got == want


def test_ivf_pq_recovers_planted_clusters(spark):
    """Verified-approximate (the pr3/pr6 discipline, for ANN): on data
    WITH cluster structure, the IVF+PQ composition must recover it —
    the probed cell contains the query's true neighbors and the PQ
    codes rank them into the top-k. (On the driver's random synthetic
    embeddings distance concentration makes ANY sublinear ANN's
    recall collapse — that corpus checks arithmetic, this checks
    retrieval.) Deterministic: seeded noise, planted centers."""
    import random

    from pyspark.sql import functions as F

    from migrator_spark.operators import similarity as sim

    rng = random.Random(7)
    dim, n_clusters, per = 8, 4, 40
    centers = [[10.0 * (c == j) for j in range(dim // 2) for _ in (0, 1)] for c in range(n_clusters)]
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            rows.append(
                (vid, c, [centers[c][d] + rng.uniform(-0.5, 0.5) for d in range(dim)])
            )
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, true_cluster long, embedding array<double>")

    # query = a fresh point near cluster 2's center
    qvec = [centers[2][d] + 0.25 for d in range(dim)]
    query = spark.createDataFrame([(qvec,)], "qe array<double>")

    # over-segment (2 learned cells per planted cluster): Lloyd's with
    # deterministic seeds can merge clusters at k == n_clusters when
    # two seeds land in one cluster; over-segmentation makes every
    # learned cell PURE instead, which is what IVF needs (a probed
    # cell only ever holds same-cluster points)
    k_cells = 2 * n_clusters
    assign = sim.kmeans_assign(emb, k=k_cells, iters=3).localCheckpoint(eager=True)
    j = emb.join(assign, "vec_id").groupBy("cell", "true_cluster").count()
    per_cell: dict[int, list[int]] = {}
    for r in j.collect():
        per_cell.setdefault(r["cell"], []).append(r["count"])
    for cell, counts in per_cell.items():
        assert max(counts) >= 0.9 * sum(counts), (cell, per_cell)

    # assign the query through the same quantizer by appending it
    emb_q = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame([(-1, qvec)], "vec_id long, embedding array<double>")
    )
    assign_q = sim.kmeans_assign(emb_q, k=k_cells, iters=3)
    probe = assign_q.filter(F.col("vec_id") == -1).select("cell")

    cand = (
        emb.select("vec_id", "embedding")
        .join(assign_q, "vec_id")
        .join(F.broadcast(probe), "cell", "leftsemi")
        .select("vec_id", "embedding")
    )
    got = sim.pq_adc_topk(
        cand, query, dim=dim, m=2, k=4, iters=3, topk=10,
        train=emb.select("vec_id", "embedding"),
    )
    ids = [r["vec_id"] for r in got.collect()]
    truth = {r["vec_id"] for r in emb.filter(F.col("true_cluster") == 2).collect()}
    recall = len(set(ids) & truth) / 10
    assert recall >= 0.9, (recall, ids)
