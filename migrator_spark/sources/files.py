"""CSV / JSON-lines directory sources: ``<root>/<table>.<ext>``.

Same named-table contract as ParquetSource, for interchange formats:
ingest legacy CSV dumps or JSONL event feeds into a pipeline, or emit
them for downstream consumers. Schema handling differs from parquet
(no embedded schema): reads infer by default, or take an explicit
``schemas[table]`` StructType — always pass one in production; at
100 TB an inference pass is a full extra scan, and CSV types are
lossy (everything is a string without a schema).

Writes reuse the symlink-pinned versioning of the parquet sink
(atomic replace, pinned readers) by delegating the swap machinery —
these formats are for edges of the pipeline, not the hot CDC path;
parquet/Delta remain the internal storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from migrator_spark.sources.parquet import _lock_for


class FileSource:
    """Generic spark.read/write file-format source (csv, json)."""

    FORMAT: str = ""
    READ_OPTS: dict[str, str] = {}
    WRITE_OPTS: dict[str, str] = {}

    def __init__(self, root: str, schemas: dict[str, StructType] | None = None) -> None:
        self.root = root.rstrip("/")
        self.schemas = schemas or {}

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}.{self.FORMAT}"

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        reader = spark.read.format(self.FORMAT).options(**self.READ_OPTS)
        schema = self.schemas.get(name)
        if schema is not None:
            reader = reader.schema(schema)
        elif self.FORMAT == "csv":
            reader = reader.option("inferSchema", "true")
        return reader.load(os.path.realpath(self._path(name)))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.exists(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        os.makedirs(self.root, exist_ok=True)
        final = self._path(name)
        writer = df.write.format(self.FORMAT).options(**self.WRITE_OPTS)
        if mode == "append" and os.path.isdir(final):
            with _lock_for(final):
                writer.mode("append").save(os.path.realpath(final))
            return
        # reuse the parquet sink's versioned-swap shape inline (the
        # version dir layout is shared so mixed-format roots don't clash)
        import uuid

        vdir = f"{self.root}/.v/{name}.{self.FORMAT}"
        os.makedirs(vdir, exist_ok=True)
        new_version = f"{vdir}/{uuid.uuid4().hex[:12]}"
        writer.mode("overwrite").save(new_version)
        with _lock_for(final):
            if os.path.lexists(final) and not os.path.islink(final):
                os.rename(final, f"{vdir}/{uuid.uuid4().hex[:12]}")
            tmp_link = f"{self.root}/.{name}.{uuid.uuid4().hex[:8]}.lnk"
            os.symlink(os.path.abspath(new_version), tmp_link)
            os.replace(tmp_link, final)
            self._gc(name)

    def _gc(self, name: str, keep: int = 3) -> None:
        import shutil

        vdir = f"{self.root}/.v/{name}.{self.FORMAT}"
        current = os.path.realpath(self._path(name))
        versions = sorted(
            (e.path for e in os.scandir(vdir) if e.is_dir()),
            key=os.path.getmtime,
            reverse=True,
        )
        for stale in [v for v in versions if os.path.abspath(v) != current][keep:]:
            shutil.rmtree(stale, ignore_errors=True)


class CsvSource(FileSource):
    FORMAT = "csv"
    READ_OPTS = {"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]"}
    WRITE_OPTS = {"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"}


class JsonSource(FileSource):
    FORMAT = "json"
    READ_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"}
    WRITE_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"}


class OrcSource(FileSource):
    """ORC directories — the other Spark-native columnar format.

    Unlike CSV/JSON these carry an embedded schema and column
    statistics, so reads get column pruning + predicate pushdown for
    free (same scan machinery as parquet: `PushedFilters` in the plan).
    Useful as an interchange edge with Hive/Trino deployments that
    standardized on ORC; internal storage remains parquet/Delta.
    """

    FORMAT = "orc"
