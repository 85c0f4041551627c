"""Offline persistence for the shared derived artifacts (VERDICT r8
#3): the shingle postings index, the verified MinHash pair graph, and
the flat-quantizer codebook are built once per corpus snapshot and
consumed by many queries. In-session the plans share them via
localCheckpoint caches (plans/llmdata._shared_*); a 100 TB deployment
instead MATERIALIZES them per crawl snapshot and loads them in every
later run. This module is that seam.

Layouts, chosen per consumer access pattern (layout.py discipline):

* ``shingle index`` — a BUCKETED parquet table, CLUSTERED BY (s) —
  every downstream candidate generator self-joins the postings on a
  key set containing ``s`` ((lang, source, s) for dd4, (lang, s) for
  dd12/dd13), and HashPartitioning(s) satisfies any clustering that
  contains s, so the self-join needs NO exchange on either side
  (pinned in tests/test_round9_artifacts.py). One knob is required
  for block+s joins: ``spark.sql.requireAllClusterKeysForCoPartition
  = false`` (Spark defaults it true so that subset co-partitioning
  can't silently concentrate skew; here ``s`` is the
  high-cardinality term of every block+s key, so bucketing on it
  alone spreads fine and the knob is safe). Written via
  saveAsTable so the bucketing metadata reaches the catalog; a JSON
  sidecar carries (schema DDL, bucket count) so a FRESH session with
  an in-memory catalog can re-register the external table and keep
  the no-shuffle property (a real deployment keeps it in the
  metastore instead).
* ``pair graph`` / ``quantizer`` — plain versioned tables through
  ParquetSource (atomic commit-log swap, OCC): the pair graph is
  joined on doc ids and the codebook/assignment are broadcast-sized,
  so neither needs bucketing; what they need is the per-snapshot
  atomic-publish semantics ParquetSource already provides.

Concurrency: the bucketed shingle-index write is SINGLE-WRITER per
store root (drop + rmtree + rewrite — no commit log); that matches
its per-crawl-snapshot lifecycle, where one build job owns the
snapshot directory. Readers of a COMMITTED snapshot are safe at any
concurrency; for multi-writer publish semantics put each snapshot in
its own root and flip a pointer, or use the ParquetSource tables
(which carry OCC).

Round-trip contract: consumers fed the READ-BACK artifact produce
bit-identical output to the in-session build (tested for
dd4/dd12/dd13/ta9 over the shingle index and the cluster/split
consumers over the pair graph).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from migrator_spark.sources.parquet import ParquetSource

PAIR_GRAPH = "minhash_pair_graph"
QUANT_CENTROIDS = "quantizer_centroids"
QUANT_ASSIGN = "quantizer_assign"


class ArtifactStore:
    """One artifact warehouse directory per corpus snapshot."""

    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")
        self._src = ParquetSource(f"{self.root}/tables")

    # ------------------------------------------------ versioned tables

    def write_pair_graph(self, pairs: DataFrame) -> None:
        self._src.write(pairs, PAIR_GRAPH)

    def read_pair_graph(self, spark: SparkSession) -> DataFrame:
        return self._src.table(spark, PAIR_GRAPH)

    def has_pair_graph(self, spark: SparkSession) -> bool:
        return self._src.exists(spark, PAIR_GRAPH)

    def write_quantizer(self, cents: DataFrame, assign: DataFrame) -> None:
        self._src.write(cents, QUANT_CENTROIDS)
        self._src.write(assign, QUANT_ASSIGN)

    def read_quantizer(
        self, spark: SparkSession
    ) -> "tuple[DataFrame, DataFrame]":
        return (
            self._src.table(spark, QUANT_CENTROIDS),
            self._src.table(spark, QUANT_ASSIGN),
        )

    def has_quantizer(self, spark: SparkSession) -> bool:
        return self._src.exists(spark, QUANT_CENTROIDS) and self._src.exists(
            spark, QUANT_ASSIGN
        )

    # ------------------------------------------- bucketed shingle index

    def _shingle_path(self) -> str:
        return f"{self.root}/shingle_index"

    def _shingle_meta(self) -> str:
        return f"{self.root}/shingle_index.meta.json"

    def shingle_table_name(self) -> str:
        """Catalog name, deterministic per store root (two stores in
        one session register as two tables)."""
        return "artifact_shingle_index_" + re.sub(
            r"[^0-9a-zA-Z]+", "_", self.root
        ).strip("_").lower()

    def write_shingle_index(self, idx: DataFrame, buckets: int = 32) -> None:
        """Materialize the postings relation bucketed (and sorted)
        by ``s``. Bucket count is a layout decision: at 100 TB pick it
        so one bucket's postings fit an executor's join partition
        (the self-join's parallelism = bucket count)."""
        spark = idx.sparkSession
        name = self.shingle_table_name()
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(self._shingle_path(), ignore_errors=True)
        (
            idx.write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, "s")
            .sortBy("s")
            .option("path", self._shingle_path())
            .saveAsTable(name)
        )
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in idx.schema.fields
        )
        with open(self._shingle_meta(), "w") as fh:
            json.dump({"buckets": buckets, "ddl": ddl}, fh)

    def has_shingle_index(self) -> bool:
        return os.path.exists(self._shingle_meta())

    def read_shingle_index(self, spark: SparkSession) -> DataFrame:
        """Catalog-first read: if this session never registered the
        table (fresh in-memory catalog), re-create the EXTERNAL
        bucketed definition from the sidecar so Spark still knows the
        files are hash-bucketed by ``s`` — reading the bare parquet
        path would silently drop the no-shuffle join property."""
        name = self.shingle_table_name()
        if not spark.catalog.tableExists(name):
            with open(self._shingle_meta()) as fh:
                meta = json.load(fh)
            spark.sql(
                f"CREATE TABLE {name} ({meta['ddl']}) USING PARQUET "
                f"CLUSTERED BY (s) INTO {meta['buckets']} BUCKETS "
                f"LOCATION '{self._shingle_path()}'"
            )
        return spark.table(name)
