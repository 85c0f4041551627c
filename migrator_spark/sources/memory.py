"""In-process named-table store (tests / ephemeral pipelines)."""

from __future__ import annotations

from typing import ClassVar

from pyspark.sql import DataFrame, SparkSession


class MemorySource:
    _instances: ClassVar[dict[str, "MemorySource"]] = {}

    def __init__(self, name: str = "") -> None:
        self.tables: dict[str, DataFrame] = {}
        # stable store identity (runner._store_key keys sequencer
        # claims on it, ADVICE r12 #1 — never on the recyclable id())
        self.name = name

    @classmethod
    def named(cls, name: str) -> "MemorySource":
        return cls._instances.setdefault(name, cls(name))

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
