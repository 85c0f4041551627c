"""Table sources/sinks behind one tiny protocol.

A Source resolves table names to DataFrames (``table``) and accepts
writes (``write``). DSN strings in pipeline configs pick the
implementation:

    parquet:///data/warehouse/a     -> ParquetSource (dir of <table>.parquet)
    csv:///data/dumps               -> CsvSource (<table>.csv, header'd)
    json:///data/feeds              -> JsonSource (<table>.json, JSON-lines)
    orc:///data/hive_export         -> OrcSource (<table>.orc, columnar)
    memory://name                   -> MemorySource (in-process dict, tests)
    jdbc:mysql://host/db            -> JdbcSource (thin spark.read.jdbc wrapper)

Mirrors the reference's source/target DSN split (cmd/migrator/config.go
SourceDsn/TargetDsn) without tying the engine to MySQL.
"""

from __future__ import annotations

from migrator_spark.sources.base import Source, open_source
from migrator_spark.sources.memory import MemorySource
from migrator_spark.sources.files import CsvSource, JsonSource, OrcSource
from migrator_spark.sources.parquet import ParquetSource

__all__ = [
    "Source",
    "open_source",
    "ParquetSource",
    "MemorySource",
    "CsvSource",
    "JsonSource",
    "OrcSource",
]
