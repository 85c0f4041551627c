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
    count, only when the current plan has fewer partitions than that.
    The input must be the NARROW pre-synthesis projection — fan out
    before payload bytes exist, so the added exchange (when it fires at
    all) carries ids and lengths, never blobs (guide §2.3: shuffle
    keys/metadata, move heavy bytes once — here, zero times)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key_col))
