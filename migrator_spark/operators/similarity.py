"""Approximate-nearest-neighbor search over embedding columns.

* cosine_topk          — brute-force exact baseline: broadcast the query
                         vector, score every row, TakeOrderedAndProject
                         top-k. One full scan, no shuffle beyond the
                         k-row merge — the correctness reference.
* ivf_topk             — the scale path: rows carry a coarse cluster id
                         (offline k-means / IVF cell; the synthetic
                         ``label`` column stands in). Only the probed
                         cells are scanned — with partition-by-cell
                         layout this is partition pruning, reading
                         cells/C of the data.
* pairwise_topk_join   — top-k neighbors for EVERY query row of a
                         (small) query set via broadcast + window rank.

All scoring is Catalyst higher-order functions in double precision
(functions.vectors) — no Python, reproducible in DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from migrator_spark.functions.vectors import cosine_similarity


def cosine_topk(
    emb: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qe",
) -> DataFrame:
    """Exact top-k by cosine against a single query vector.

    ``query_vec``: 1-row frame holding the query embedding (column
    ``query_vec_col``). Broadcast cross-join (1 row), score, top-k.
    """
    scored = emb.crossJoin(F.broadcast(query_vec)).withColumn(
        "cos_sim", cosine_similarity(vec_col, query_vec_col)
    )
    return (
        scored.select(id_col, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: DataFrame,
    probe_cells: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    query_vec_col: str = "qe",
) -> DataFrame:
    """IVF-style pruned top-k: scan only rows whose coarse-cluster id is
    in ``probe_cells`` (1-column frame of cell ids, e.g. the nearest
    centroids to the query chosen by the offline quantizer).

    The cell filter arrives as a broadcast semi-join so Catalyst can
    turn it into partition pruning when the table is laid out by cell.
    """
    pruned = emb.join(F.broadcast(probe_cells), on=cluster_col, how="leftsemi")
    return cosine_topk(pruned, query_vec, k, id_col, vec_col, query_vec_col)


def pairwise_topk_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "qe",
) -> DataFrame:
    """Top-k corpus neighbors for each row of a small query set.

    Broadcast the query set, score all (corpus x query) pairs, rank per
    query with a window. Corpus side is never shuffled; the window
    partitions by query id (|Q| partitions).
    """
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .withColumn("cos_sim", cosine_similarity(vec_col, q_vec_col))
        .filter(F.col(id_col) != F.col(q_id_col))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos_sim", "rank")
    )


def incremental_topk(
    old_topk: DataFrame,
    new_batch: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qe",
) -> DataFrame:
    """Maintain an exact top-k under corpus growth without rescanning.

    Top-k is monotone under union: topk(A ∪ B) = topk(topk(A) ∪ score(B)),
    so an arriving batch only needs its own rows scored and merged with
    the k retained rows (the incremental-session pattern of EDBT'20
    "Incremental Top-K Similarity Search"). Per batch this is O(|batch|
    + k), not O(corpus) — at 100 TB the corpus is never re-read; with
    the CDC runner this slots in as a transformer keeping a "nearest
    neighbors so far" table fresh.

    ``old_topk``: (id_col, cos_sim) — the previous result. Returns the
    merged exact top-k with the same deterministic tiebreak as
    cosine_topk, so the result equals a full recompute bit-for-bit.
    """
    scored_new = (
        new_batch.crossJoin(F.broadcast(query_vec))
        .withColumn("cos_sim", cosine_similarity(vec_col, query_vec_col))
        .select(id_col, "cos_sim")
    )
    return (
        old_topk.select(id_col, "cos_sim")
        .unionByName(scored_new)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
