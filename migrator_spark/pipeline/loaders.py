"""Named loaders (the reference hard-wires DefaultLoader,
cmd/migrator/main.go:99-100; here a registry like the other stages).

"default" reproduces loader_default.go:9-72 as set algebra over any
Source:

* batch entirely INSERT and target exists -> append fast path: new
  part-files only, no rewrite, no shuffle (the reference's batched
  multi-row INSERT, batched_queries.go:79-156).
* otherwise -> merge: per-key last-write-wins resolution then
  survivors ∪ upserts (operators.load.apply_cdc_batch), REMOVE keys
  dropped — REPLACE/DELETE semantics (batched_queries.go:21-23,28-74)
  — written atomically as the new table version.

Scale: the merge broadcasts the (bounded) batch against the large
target; with a Delta/Iceberg sink the same batch feeds MERGE INTO and
only matching files rewrite. Transactionality (loader_default.go:30-34):
the Source's atomic swap plays the per-batch transaction; offsets
commit after it (runner), so failures replay idempotently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrator_spark.operators import extract as ex
from migrator_spark.operators import load as ld
from migrator_spark.pipeline.config import IterationSpec, Parameters
from migrator_spark.pipeline.registries import register_loader
from migrator_spark.sources.base import Source

META_COLS = (ex.METHOD_COL, "_order", "_tie")


@register_loader("default")
def load_default(
    spark: SparkSession,
    target: Source,
    table: str,
    batch: DataFrame,
    it: IterationSpec,
    params: Parameters,
) -> None:
    key_cols = [c for c in it.merge_key_cols if c in batch.columns]
    data_cols = [c for c in batch.columns if c not in META_COLS]

    methods = {r[0] for r in batch.select(ex.METHOD_COL).distinct().collect()}
    if methods <= {ex.M_INSERT} and target.exists(spark, table):
        target.write(batch.select(*data_cols), table, mode="append")
        return

    if not target.exists(spark, table):
        final = ld.latest_by_key(batch, key_cols, "_order", "_tie")
        target.write(
            final.filter(F.col(ex.METHOD_COL) != ex.M_REMOVE).select(*data_cols),
            table,
            mode="overwrite",
        )
        return

    current = target.table(spark, table)
    merged = ld.apply_cdc_batch(
        current, batch.select(*current.columns, ex.METHOD_COL, "_order", "_tie"),
        key_cols, "_order", "_tie",
    )
    target.write(merged, table, mode="overwrite")
