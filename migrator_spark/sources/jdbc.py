"""JDBC source/sink (thin wrapper over spark.read/write.jdbc).

Production path for the reference's MySQL->MySQL replication shape:
reads partition on the tracking column (numPartitions/lowerBound/
upperBound) so a 100 TB table scans in parallel; writes use JDBC
``batchsize`` (the reference's InsertBatchSize, loader_default.go:12)
and isolation none for idempotent upsert targets.

No JDBC driver ships in this container, so this class is exercised by
unit tests only through its option-building logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcSource:
    def __init__(self, url: str, batch_size: int = 1000, num_partitions: int = 32) -> None:
        self.url = url
        self.batch_size = batch_size
        self.num_partitions = num_partitions

    def reader_options(
        self,
        table: str,
        partition_column: str | None = None,
        lower: int | None = None,
        upper: int | None = None,
    ) -> dict[str, str]:
        opts = {"url": self.url, "dbtable": table, "fetchsize": str(self.batch_size)}
        if partition_column is not None:
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower or 0),
                upperBound=str(upper or 1),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def writer_options(self, table: str) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": table,
            "batchsize": str(self.batch_size),
            "isolationLevel": "NONE",
        }

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format("jdbc").options(**self.reader_options(name)).load()

    def exists(self, spark: SparkSession, name: str) -> bool:
        try:
            self.table(spark, name).schema
            return True
        except Exception:
            return False

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.format("jdbc").options(**self.writer_options(name)).mode(
            "append" if mode == "append" else "overwrite"
        ).save()
