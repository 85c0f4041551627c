"""Source protocol + DSN dispatch."""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class Source(Protocol):
    """A named-table store: the engine's read/write boundary."""

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        """Load a table as a DataFrame (lazy; pushdown-friendly)."""
        ...

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        """Persist a DataFrame as the new content of ``name``
        (mode='append' adds files without rewriting — the insert-only
        fast path)."""
        ...

    def exists(self, spark: SparkSession, name: str) -> bool: ...


def rmw(source: Source, spark: SparkSession, name: str, fn) -> None:
    """Read-modify-write ``name``: replace it with ``fn(current_df)``.

    Dispatches to the source's own ``rmw`` when it has one (ParquetSource
    holds its per-table lock across the fresh read and the swap, so a
    concurrent append can't land in the window and be dropped by the
    rewrite — the single-process analogue of Delta's conflict check).
    The fallback MATERIALIZES fn's result before overwriting: for an
    in-place store (JDBC) the overwrite truncates the very table the
    lazy plan still has to read — without the checkpoint the rewrite
    would consume its own destruction.
    """
    native = getattr(source, "rmw", None)
    if native is not None:
        native(spark, name, fn)
    else:
        out = fn(source.table(spark, name)).localCheckpoint(eager=True)
        source.write(out, name, mode="overwrite")


def open_source(dsn: str, params=None) -> Source:
    """Resolve a DSN string to a Source implementation.

    ``params`` (pipeline ``Parameters``) carries the knobs some sources
    honor — for JDBC, ``insert_batch_size`` is the writer's JDBC
    ``batchsize`` (the reference's InsertBatchSize, loader_default.go:12).
    """
    from migrator_spark.sources.memory import MemorySource
    from migrator_spark.sources.parquet import ParquetSource

    if dsn.startswith("parquet://"):
        return ParquetSource(dsn[len("parquet://") :])
    if dsn.startswith("csv://"):
        from migrator_spark.sources.files import CsvSource

        return CsvSource(dsn[len("csv://") :])
    if dsn.startswith("json://"):
        from migrator_spark.sources.files import JsonSource

        return JsonSource(dsn[len("json://") :])
    if dsn.startswith("orc://"):
        from migrator_spark.sources.files import OrcSource

        return OrcSource(dsn[len("orc://") :])
    if dsn.startswith("memory://"):
        return MemorySource.named(dsn[len("memory://") :])
    if dsn.startswith("delta://"):
        from migrator_spark.sources.delta import DeltaSource

        return DeltaSource(dsn[len("delta://") :])
    if dsn.startswith("jdbc:"):
        from migrator_spark.sources.jdbc import JdbcSource

        if params is not None and getattr(params, "insert_batch_size", None):
            return JdbcSource(dsn, batch_size=params.insert_batch_size)
        return JdbcSource(dsn)
    # bare path -> parquet dir
    return ParquetSource(dsn)
