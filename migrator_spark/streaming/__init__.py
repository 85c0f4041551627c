"""Structured Streaming shell: the production path for continuous CDC.

The batch pipeline (pipeline/runner.py) mirrors the reference's polling
loop exactly; this package is the same E->T->L semantics expressed as
Structured Streaming — checkpointed offsets and exactly-once-per-batch
sink commits come from the engine instead of hand-rolled tracking.
"""

from migrator_spark.streaming.streams import (
    cdc_apply_stream,
    curation_ingest_stream,
    enable_rocksdb_state,
    windowed_event_counts,
)

__all__ = [
    "cdc_apply_stream",
    "curation_ingest_stream",
    "enable_rocksdb_state",
    "windowed_event_counts",
]
