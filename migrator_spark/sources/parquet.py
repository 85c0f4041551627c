"""Parquet-directory source/sink: ``<root>/<table>.parquet`` (a file or
a directory of part-files).

Writes are atomic per table: the new version is written to a temp
sibling then swapped in with an os.replace/rename — readers see either
the old or the new table, never a partial. (Delta/Iceberg would give
MVCC commits; this is the dependency-free equivalent at
table-replacement granularity, per SURVEY.md §7.4.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetSource:
    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}.parquet"

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        # route through tables.load_table conversion rules only for the
        # canonical testdata; generic dirs read raw
        return spark.read.parquet(self._path(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.exists(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        os.makedirs(self.root, exist_ok=True)
        final = self._path(name)
        if mode == "append" and os.path.isdir(final):
            # insert-only fast path: add part-files, no rewrite
            df.write.mode("append").parquet(final)
            return
        tmp = f"{self.root}/.{name}.{uuid.uuid4().hex[:8]}.tmp"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.root}/.{name}.old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)
