"""Physical data layout: Hive-partitioned and range-clustered writes.

Two layout tools complete the scale story alongside bucketing.py
(hash co-location for joins):

* ``write_partitioned`` — directory partitioning on low-cardinality
  columns. A filter on the partition column prunes whole directories at
  *planning* time (`PartitionFilters` in the scan node): at 100 TB with
  daily partitions, a one-day query lists and reads 1/N of the table
  before a single byte of parquet is opened. The per-column directory
  fan-out is the unit of retention/compaction too.

* ``write_range_clustered`` — global sort-order layout
  (``repartitionByRange`` + ``sortWithinPartitions``) on a
  high-cardinality column (e.g. event time) where directory
  partitioning would explode into millions of dirs. Matching rows
  concentrate into few files, so parquet footer min/max statistics let
  the scan skip everything else (the poor man's Z-order; one
  clustering column is the common case and needs no interleaving).

The reference has no physical layout at all — its pruning is MySQL
indexes (/root/reference/extractor_sequential.go:39). Both writers are
plain DataFrame writes: the layout decision IS the optimization, the
read path stays declarative and Catalyst does the pruning.

Small-files discipline: ``write_partitioned`` hash-repartitions on the
partition columns first, so each partition value is written by exactly
one task → one file per directory (without this, every one of the
shuffle's N tasks writes its own sliver into every directory — N×dirs
files). At 100 TB pick ``extra_split_cols`` (e.g. a hash bucket) if one
partition value exceeds a healthy file size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    extra_split_cols: list[str] | None = None,
) -> None:
    """Write ``df`` Hive-partitioned by ``partition_cols``.

    ``sort_cols`` clusters rows within each file (footer min/max
    skipping inside a partition). ``extra_split_cols`` spreads one
    partition value over several tasks/files when a single value is too
    big for one file (skew-safe fan-out).
    """
    split = list(partition_cols) + list(extra_split_cols or [])
    out = df.repartition(*[F.col(c) for c in split])
    if sort_cols:
        out = out.sortWithinPartitions(*split, *sort_cols)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset. Filters on partition columns prune
    directories at planning time — verify with `.explain()`:
    `PartitionFilters: [...]` on the scan node."""
    return spark.read.parquet(path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int,
) -> None:
    """Write ``df`` globally range-clustered on ``cluster_cols``:
    rows are range-partitioned into ``num_files`` contiguous slices and
    sorted within each, so any value interval maps to few files and
    parquet min/max statistics skip the rest. Use for high-cardinality
    predicates (timestamps, sequence keys) where directory partitioning
    is infeasible. At 100 TB size ``num_files`` so one file ≈ 0.5-1 GB.
    """
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
