"""Incremental pipeline runner: the reference's E->T->L loop, Spark-first.

config      YAML pipeline spec (mirrors cmd/migrator/config.go keys)
registries  named extractor/transformer/loader maps (types.go:16-19)
tracking    restartable per-table offsets (tracking.go), committed only
            AFTER a successful load — fixing the reference's known
            offset-before-load data-loss flaw (SURVEY.md §2.11)
extractors  "sequential" / "timestamp" / "timestamp_fallback" / "queue"
transformers "default" / "tablerenamer" / "python" (T3 done right)
loaders     "default" merge loader (insert append fast path, REPLACE
            merge, REMOVE anti-join) over any Source
runner      Migrator: iterations, drain/continuous modes, lifecycle
"""

from migrator_spark.pipeline.config import MigratorConfig, load_config
from migrator_spark.pipeline.runner import Migrator

__all__ = ["MigratorConfig", "load_config", "Migrator"]
