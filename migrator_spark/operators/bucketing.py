"""Bucketed (co-located) tables: shuffle-free fact-fact joins.

Broadcast covers dim joins; for fact⋈fact (orders⋈lineitem on
orderkey, CDC target⋈batch on PK) both sides are too big to
broadcast and a sort-merge join shuffles 100 TB twice. Bucketing
pre-shuffles ONCE at write time: both tables hash-clustered into the
same number of buckets on the join key, so every subsequent join /
groupBy on that key is exchange-free — the scan itself reports the
hash partitioning and Catalyst drops both Exchanges (verified in
tests/test_bucketing.py by asserting no Exchange node in the executed
plan).

This is the 100 TB answer for the repeated-merge workload the engine
runs continuously: bucket the CDC target by its merge key once, and
every per-batch merge afterwards avoids re-shuffling the target
(SCALE.md §2). The reference has no notion of physical layout — its
"co-location" is MySQL's PK index (/root/reference/batched_queries.go).

Spark requires bucketed data to live in the session catalog (the
bucket hash lives in table metadata, not parquet footers), hence
``saveAsTable`` with an explicit ``path`` (external table) rather than
raw ``.parquet()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``sort_cols`` additionally sorts within buckets (eliminates the
    sort phase of SMJ, not just the exchange). ``num_buckets`` must
    match across tables that will be joined (at 100 TB: size so one
    bucket ≈ 100-500 MB per table).
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (must go through the catalog — a raw
    parquet read of the same files loses the bucketing metadata and
    reintroduces the shuffle)."""
    return spark.table(table_name)
