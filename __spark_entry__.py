"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``migrator_spark.plans.registry`` — the engine's named
query registry (one entry per implemented operator from SURVEY.md §2,
plus the training-data-pipeline surface).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from migrator_spark.plans import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the full CDC merge (l0_apply_cdc_batch): queue batch
    resolved last-write-wins per key, REPLACE upserts + REMOVE deletes
    applied to the target in one pass of set algebra — the reference's
    entire E->T->L capability in a single DataFrame plan.
    """
    return _registry.REGISTRY["l0_apply_cdc_batch"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() key (ANSI, runs on the
    pre-registered parquet views)."""
    return _registry.oracle_sql()
