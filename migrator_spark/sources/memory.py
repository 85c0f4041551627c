"""In-process named-table store (tests / ephemeral pipelines)."""

from __future__ import annotations

from typing import ClassVar

from pyspark.sql import DataFrame, SparkSession


class MemorySource:
    _instances: ClassVar[dict[str, "MemorySource"]] = {}

    def __init__(self) -> None:
        self.tables: dict[str, DataFrame] = {}

    @classmethod
    def named(cls, name: str) -> "MemorySource":
        return cls._instances.setdefault(name, cls())

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        return self.tables[name]

    def exists(self, spark: SparkSession, name: str) -> bool:
        return name in self.tables

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if mode == "append" and name in self.tables:
            self.tables[name] = self.tables[name].unionByName(df)
        else:
            # materialize so later reads don't re-run upstream lineage
            self.tables[name] = df.localCheckpoint(eager=True)
