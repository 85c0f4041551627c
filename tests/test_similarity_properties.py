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
