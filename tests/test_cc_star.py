"""Star-contraction connected components (operators/dedup.py
_star_contract / duplicate_clusters_star): correctness vs a union-find
oracle on adversarial shapes, and the O(log n) round bound that
justifies it over min-label propagation (VERDICT r2 #6)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from migrator_spark.operators.dedup import (
    _star_contract,
    duplicate_clusters,
    duplicate_clusters_star,
)


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _got(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_star_path_graph_logarithmic_rounds(spark):
    """A 128-node path is the adversarial case: min-label propagation
    needs ~127 diameter rounds; star contraction must finish in
    O(log n). The bound pinned here (2*log2(n) + 2 = 16) fails loudly
    if anyone regresses the contraction to propagation."""
    n = 128
    edges = [(i, i + 1) for i in range(n - 1)]
    canon = (
        _pairs_df(spark, edges)
        .select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    stars, rounds = _star_contract(canon, max_iters=20)
    assert rounds <= 2 * int(math.log2(n)) + 2, rounds
    # all 127 non-root nodes point straight at the component min
    assert sorted(map(tuple, stars.collect())) == [(i, 0) for i in range(1, n)]


def test_star_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(40)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expect = _uf_components(edges)
        got = _got(duplicate_clusters_star(_pairs_df(spark, edges)))
        assert got == expect, f"trial {trial}"


def test_star_equals_label_propagation_on_lsh_pairs(spark, sf_dir):
    """dd6 oracle unchanged: both variants produce identical clusters
    on the real MinHash-LSH pair graph."""
    from migrator_spark.operators import dedup as dd
    from migrator_spark.plans.llmdata import (
        MINHASH_BANDS,
        MINHASH_NUM,
        MINHASH_THRESH,
    )
    from migrator_spark.tables import load_table

    pairs = dd.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=MINHASH_NUM,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESH,
    ).localCheckpoint(eager=True)
    a = sorted(map(tuple, duplicate_clusters(pairs).collect()))
    b = sorted(map(tuple, duplicate_clusters_star(pairs).collect()))
    assert a == b


def test_star_contract_raises_instead_of_wrong_labels(spark):
    """Exhausting max_iters must be an ERROR, never silently-wrong
    cluster ids from an unconverged edge set."""
    import pytest
    from migrator_spark.operators.dedup import duplicate_clusters_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        duplicate_clusters_star(chain, max_iters=1).collect()
