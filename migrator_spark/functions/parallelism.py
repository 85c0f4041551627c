"""Scale-adaptive parallelism for expensive per-row Python stages.

The multimodal/codec operators run heavyweight Arrow ``mapInPandas``
bodies (full JPEG/PNG/WAV codecs) whose cost is per ROW, not per byte
of input. Their input is a narrow (id, length) projection of a scan —
and a scan's parallelism is its file split count. At 100 TB that is
thousands of tasks; on a single small parquet file (one row group, so
``maxPartitionBytes`` cannot split it) it is ONE task, serializing the
entire codec stage on one core of the whole machine (guide §2.5 "input
skew", §4 "the Python boundary": measured round 13, mm8's decode chain
ran 1/32 cores, see OPTIMIZATION_r13.md).

``fan_out`` widens such a stage only when the incoming plan is
NARROWER than the session's core count: a deterministic hash
repartition on the id column (high-cardinality, so the spread is even
— and deterministic under task retries, the guide §2.5 rand() trap)
up to ``defaultParallelism`` partitions. When the scan already carries
>= cores partitions (any real deployment) it is a no-op — no shuffle
is added at scale, where the payload bytes would make one expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition ``df`` by hash of ``key_col`` to the session's core
    count, only when the backing scan cannot already feed that many
    tasks. The input must be the NARROW pre-synthesis projection — fan
    out before payload bytes exist, so the added exchange (when it
    fires at all) carries ids and lengths, never blobs (guide §2.3:
    shuffle keys/metadata, move heavy bytes once — here, zero times).

    The guard reads ``df.inputFiles()`` — the logical plan's file
    index, no physical planning and no job (VERDICT r13 #9: the old
    getNumPartitions probe on the Python-side RDD converted the plan
    to an RDD, i.e. a second physical planning — and under AQE an
    eager materialization of any exchange already in the plan — at
    every call). A source with >= cores files certainly plans >= cores scan
    tasks, so the probe is a no-op at any real deployment scale; the
    local single-file fixtures (the case the exchange exists for) read
    one file. A source of FEW huge files (< cores files that would
    still split to >= cores tasks by maxPartitionBytes) takes one
    redundant narrow exchange — ids and lengths only, the cheap side
    of that trade. Callers composing already-fanned inputs (e.g.
    synth_mixed_payloads' per-format branches) must skip fan_out
    themselves: the file probe deliberately ignores exchanges already
    in the plan."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target, F.col(key_col))
