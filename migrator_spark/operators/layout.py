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


def zorder_key(
    df: DataFrame, cluster_cols: list[str], bits_per_dim: int = 8
) -> "F.Column":
    """Z-order (Morton) key over ``cluster_cols``: per-column
    quantile-bucketed ranks, bit-interleaved so nearby values in EVERY
    dimension stay nearby in the 1-D sort order.

    Buckets come from ``approxQuantile`` (one cheap sketch pass, tiny
    driver-side boundary list), so skewed distributions still split
    evenly — uniform-width buckets would collapse under skew. The rank
    lookup compiles to a literal-array comparison inside whole-stage
    codegen (no UDF), and the interleave is constant-folded bitwise
    arithmetic: the whole key is one JVM expression per row.
    """
    n_buckets = 1 << bits_per_dim
    qs = [i / n_buckets for i in range(1, n_buckets)]
    ranks = []
    for c in cluster_cols:
        as_num = F.col(c).cast("double")
        # one approxQuantile action per column; boundaries become literals
        bounds = df.select(as_num.alias("v")).approxQuantile("v", qs, 0.001)
        # dedupe plateaus from heavy hitters: repeated boundaries would
        # waste bucket codes on one value
        uniq = sorted(set(bounds))
        arr = F.array(*[F.lit(b) for b in uniq])
        rank = F.size(F.filter(arr, lambda b: as_num >= b))
        # stretch low-cardinality dims (rank 0..len(uniq)) over the full
        # 0..n_buckets-1 code space so every dimension's information sits
        # in the SAME bit positions — otherwise a 15-value column's
        # 4 effective bits land below the other dim's bits 4-7 in the
        # interleave and that dimension loses all file-level locality
        ranks.append(F.floor(rank * n_buckets / F.lit(len(uniq) + 1)))
    z = F.lit(0)
    for i in range(bits_per_dim):
        for d, r in enumerate(ranks):
            bit = F.shiftrightunsigned(r.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(ranks) + d))
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int,
    bits_per_dim: int = 8,
) -> None:
    """Write ``df`` Z-order clustered on ``cluster_cols``: files tile the
    multi-dimensional key space, so a predicate on ANY subset of the
    clustering columns concentrates into a fraction of files and parquet
    min/max statistics skip the rest. This is the layout for the
    "filter by user AND time range" shape where single-column range
    clustering only serves one of the two predicates.

    The write is still one range shuffle + local sort — Morton encoding
    just changes the sort key, so cost is identical to
    ``write_range_clustered`` at any scale.
    """
    with_key = df.withColumn("_zkey", zorder_key(df, cluster_cols, bits_per_dim))
    (
        with_key.repartitionByRange(num_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


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
