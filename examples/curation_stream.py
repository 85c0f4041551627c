#!/usr/bin/env python
"""Continuous crawl-shard curation: watch a directory for new document
shards, gate + dedup them on arrival, and append the curated stream to
a parquet store ready for the batch stages (decontaminate / mixture /
packing).

    python examples/curation_stream.py IN_DIR OUT_DIR CKPT_DIR [--once]

IN_DIR receives parquet shards with schema
(doc_id long, ingest_ts timestamp, text string). --once drains what's
there and exits (availableNow); without it the query runs until
Ctrl-C, picking up each new shard as it lands. State: the Gopher gate
is stateless; dedup state is one entry per content hash inside the
1-day watermark, held in RocksDB so horizon size is a disk budget,
not a heap budget.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from migrator_spark.session import get_spark  # noqa: E402
from migrator_spark.streaming.streams import (  # noqa: E402
    curation_ingest_stream,
    enable_rocksdb_state,
)

SCHEMA = "doc_id long, ingest_ts timestamp, text string"


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    in_dir, out_dir, ckpt = sys.argv[1:4]
    once = "--once" in sys.argv
    spark = get_spark("curation-stream")
    spark.sparkContext.setLogLevel("WARN")
    enable_rocksdb_state(spark)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    writer = (
        curation_ingest_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
