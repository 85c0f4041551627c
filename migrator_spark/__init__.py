"""migrator_spark — a PySpark-native incremental-ETL / analytics engine.

A from-scratch reimplementation of the capability surface of
jbuchbinder/migrator (a Go continuous incremental ETL/CDC replicator —
see SURVEY.md) re-expressed Spark-first: every operator is a pure
``DataFrame -> DataFrame`` function planned by Catalyst, composed into
incremental pipelines by a config-driven runner with checkpointed
offsets and idempotent merge sinks, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Layout:
    session     SparkSession factory tuned for the target scale
    tables      canonical table loaders for the test parquet layout
    functions/  cross-engine-stable scalar helpers (hashing, text, vectors)
    operators/  extract / load / dedup / similarity / text operators
    plans/      named query registry (queries + DuckDB oracle SQL) + TPC-H-ish
    pipeline/   YAML-driven incremental runner (tracking, registries, loaders)
    streaming/  Structured Streaming shell (foreachBatch CDC apply)
"""

__version__ = "0.1.0"
