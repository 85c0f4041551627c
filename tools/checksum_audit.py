#!/usr/bin/env python
"""Replication audit CLI: bucketed checksum diff of two parquet tables.

    python tools/checksum_audit.py SRC.parquet DST.parquet KEY_COL \
        [n_buckets] [row_col ...]

Prints the mismatched buckets (none = replicas identical modulo 60-bit
hash collisions) and exits 1 on any mismatch — the distributed answer
to "did the migration copy everything?", which the reference leaves to
the operator (no validation surface at all; its only integrity device
is MySQL PK enforcement, loader_batched.go).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from migrator_spark.operators.quality import checksum_diff  # noqa: E402
from migrator_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    src_path, dst_path, key = sys.argv[1:4]
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    spark = get_spark("checksum-audit")
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(src_path)
    dst = spark.read.parquet(dst_path)
    row_cols = sys.argv[5:] or [c for c, _ in src.dtypes]
    bad = checksum_diff(src, dst, key, list(row_cols), n_buckets).collect()
    if not bad:
        print(f"OK: {n_buckets}/{n_buckets} buckets match on {row_cols}")
        return 0
    for r in sorted(bad, key=lambda r: (r["bucket"] is None, r["bucket"])):
        print(
            f"MISMATCH bucket={r['bucket']} src_rows={r['src_rows']} "
            f"dst_rows={r['dst_rows']} src_hash={r['src_hash']} dst_hash={r['dst_hash']}"
        )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
