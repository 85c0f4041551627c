"""Deterministic sequence packing for training-data assembly.

After curation/mixing, pretraining pipelines concatenate documents into
a token stream and chop it into fixed-budget training sequences (the
"packing" step of GPT-style data loaders). Done naively that is a
global, order-dependent operation — a single serial stream — which is
exactly what a distributed engine must avoid.

The distributed form used here: documents are first routed to one of
``n_buckets`` independent streams by a stable content-free hash of
their id, then packed greedily WITHIN each bucket in hash order. Each
bucket is an independent serial stream, so the plan is one partitioned
window (cumulative token sum) — no global sort, no single reducer, and
the assignment is invariant to cluster size, input partitioning and
reruns (the same auditability property as the hash-sampling split
operators). At 100 TB the bucket count scales with the corpus
(tokens_per_bucket ~ total/n_buckets) while every per-bucket window
state stays bounded.

Every output column is exact integer arithmetic (integer division, no
floats), so the DuckDB differential oracle matches bit-for-bit.

Reference scope note: the reference engine (jbuchbinder/migrator) has
no training-data surface; this module is part of the LLM-pipeline layer
the blueprint (SURVEY.md §7) adds on top of the CDC core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from migrator_spark.functions.hashing import stable_hash64, words


def pack_sequences(
    docs: DataFrame,
    token_budget: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    totals: DataFrame | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document a position in a packed token stream.

    Returns one row per document:

    - ``bucket``        — which independent stream (0..n_buckets-1)
    - ``n_tokens``      — whitespace token count of the document
    - ``start_offset``  — token offset of the document within its
      bucket's concatenated stream
    - ``chunk_id``      — index of the fixed-size training sequence the
      document STARTS in (``start_offset div token_budget``)
    - ``crosses_chunk`` — whether the document straddles a sequence
      boundary (its tail lands in a later chunk); packing-aware loaders
      use this to decide where attention masks reset

    The within-bucket order is (hash(id), id) — deterministic,
    uniformly shuffled, and reproducible on any engine. The whole plan
    is one partitioned window over (bucket) ordered by that key: the
    cumulative sum is computed per bucket in parallel, shuffle volume
    is one row per document, and no stage sees more than one bucket's
    stream.

    With ``totals`` (bucket, tokens_packed — see ``bucket_totals``),
    each bucket's stream starts at its persisted end offset instead of
    0: the incremental-append form (one broadcast of n_buckets rows on
    top of the same single-window plan).

    ``n_tokens_col`` (round 11): pack by a PRECOMPUTED per-document
    token count instead of the whitespace proxy — the production form,
    where lengths come from the real tokenizer (e.g. the BPE serving
    table, textops.bpe_apply_merges) and the loader's sequence budget
    must be exact in model tokens, not words. Same single-window plan;
    only the length expression changes.
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    hkey = stable_hash64(F.col(id_col).cast("string"))
    ntok = (
        F.col(n_tokens_col) if n_tokens_col else F.size(words(text_col))
    ).cast("long")
    base = docs.select(
        F.col(id_col),
        (hkey % F.lit(n_buckets)).cast("long").alias("bucket"),
        hkey.alias("hkey"),
        ntok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("hkey").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    budget = int(token_budget)
    start = cum - F.col("n_tokens")
    if totals is not None:
        base = base.join(
            F.broadcast(totals.select("bucket", "tokens_packed")),
            on="bucket",
            how="left",
        )
        start = F.coalesce(F.col("tokens_packed"), F.lit(0)) + start
    offsets = base.select(
        id_col,
        "bucket",
        "n_tokens",
        start.alias("start_offset"),
    )
    # `div` (not floor of a float division): exact at any stream length
    chunk = F.expr(f"start_offset div {budget}")
    last_chunk = F.expr(f"(start_offset + n_tokens - 1) div {budget}")
    return offsets.select(
        id_col,
        "bucket",
        "n_tokens",
        "start_offset",
        chunk.alias("chunk_id"),
        (last_chunk > chunk).alias("crosses_chunk"),
    )


def bucket_totals(
    docs: DataFrame,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket token totals of an already-packed corpus — the
    O(n_buckets) state a continuous packing pipeline persists between
    batches (bucket, tokens_packed). One scan, one tiny aggregate."""
    hkey = stable_hash64(F.col(id_col).cast("string"))
    return (
        docs.select(
            (hkey % F.lit(n_buckets)).cast("long").alias("bucket"),
            F.size(words(text_col)).cast("long").alias("tk"),
        )
        .groupBy("bucket")
        .agg(F.sum("tk").alias("tokens_packed"))
    )


def pack_sequences_incremental(
    new_docs: DataFrame,
    totals: DataFrame,
    token_budget: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append a new batch of documents to an existing packed stream
    WITHOUT re-packing the corpus — the incremental maintenance form of
    ``pack_sequences`` for continuous ingest (dd8's cost-class story,
    applied to packing): each bucket's new docs are packed in hash
    order starting at that bucket's persisted end offset
    (``totals``: bucket, tokens_packed — from ``bucket_totals`` or the
    previous batch's running state).

    Cost is O(batch) + a broadcast of the n_buckets-row totals; the
    packed corpus itself is never touched. Already-assigned documents
    keep their offsets forever (training resumability); the price of
    incrementality is that a batch's docs always land AFTER everything
    packed before them, so the global hash-order interleave of a
    from-scratch repack is not reproduced — assignments are stable
    per-history, not history-independent.

    Thin wrapper over ``pack_sequences(totals=...)`` — ONE copy of the
    hash/window/chunk arithmetic keeps the no-history == from-scratch
    invariant structurally true instead of test-enforced.
    """
    return pack_sequences(
        new_docs,
        token_budget,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        totals=totals,
    )


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment for training
    export: every doc gets (shard, pos) where ``shard`` is a stable
    hash bucket and ``pos`` is the doc's rank within its shard in hash
    order — together a reproducible global permutation materialized as
    ``n_shards`` independent files, the layout a data loader streams
    round-robin to see a shuffled corpus without any engine ever
    holding a global sort.

    Reproducible across reruns, engines, and cluster sizes (pure
    function of doc ids). Scale: ONE shuffle (hash partition by shard)
    and a per-shard sort of corpus/n_shards rows each — no global
    ordering anywhere; n_shards is chosen so a shard fits a writer
    task (e.g. 100k shards at 100 TB = 1 GB each).
    """
    h = stable_hash64(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col), h.alias("_h"))
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )
