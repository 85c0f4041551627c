"""Source-layer units: JDBC option building (no driver in container)
and the memory source's append/overwrite semantics."""

from __future__ import annotations

from migrator_spark.sources.jdbc import JdbcSource
from migrator_spark.sources.memory import MemorySource


def test_jdbc_reader_options_partitioned():
    s = JdbcSource("jdbc:mysql://host/db", batch_size=500, num_partitions=8)
    ro = s.reader_options("t", partition_column="id", lower=10, upper=99)
    assert ro == {
        "url": "jdbc:mysql://host/db",
        "dbtable": "t",
        "fetchsize": "500",
        "partitionColumn": "id",
        "lowerBound": "10",
        "upperBound": "99",
        "numPartitions": "8",
    }
    # unpartitioned read: no bounds keys at all
    assert "partitionColumn" not in s.reader_options("t")


def test_jdbc_writer_options():
    s = JdbcSource("jdbc:mysql://host/db", batch_size=250)
    wo = s.writer_options("t")
    # batchsize = the reference's InsertBatchSize (loader_default.go:12);
    # isolation NONE because the merge algebra is idempotent
    assert wo["batchsize"] == "250" and wo["isolationLevel"] == "NONE"
    assert wo["dbtable"] == "t"


def test_memory_source_append(spark):
    m = MemorySource.named("t_mem_test")
    m.write(spark.range(3).toDF("id"), "x")
    m.write(spark.range(3, 5).toDF("id"), "x", mode="append")
    assert sorted(r["id"] for r in m.table(spark, "x").collect()) == [0, 1, 2, 3, 4]
    m.write(spark.range(1).toDF("id"), "x")  # overwrite resets
    assert m.table(spark, "x").count() == 1
