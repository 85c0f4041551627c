"""Cross-process writer isolation for the versioned-parquet sink.

Round 3 left one declared residual (SCALE.md §6.1): the per-table lock
was a ``threading.Lock``, so two SEPARATE driver processes writing one
table could interleave an append with a version swap and silently drop
the appended rows. The sink now layers an ``fcntl.flock`` lockfile under
the thread lock; these tests prove mutual exclusion with real second
processes, not threads.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

# ---------------------------------------------------------------------------
# 1. Lock primitive: two processes doing read-increment-write on a shared
#    counter under _TableLock must never lose an update. Without the flock
#    (thread locks are per-process) this loses ~half the increments.
# ---------------------------------------------------------------------------

_COUNTER_WORKER = textwrap.dedent(
    """
    import sys, time
    sys.path.insert(0, {repo!r})
    from migrator_spark.sources.parquet import _TableLock

    path, lockfile, iters = sys.argv[1], sys.argv[2], int(sys.argv[3])
    lock = _TableLock(lockfile)
    for _ in range(iters):
        with lock:
            n = int(open(path).read())
            time.sleep(0.0005)  # widen the lost-update window
            with open(path, "w") as f:
                f.write(str(n + 1))
    """
)


def test_flock_mutual_exclusion_across_processes(tmp_path):
    counter = tmp_path / "counter"
    counter.write_text("0")
    lockfile = str(tmp_path / ".v" / "t.parquet.lock")
    iters = 150
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _COUNTER_WORKER.format(repo=REPO),
             str(counter), lockfile, str(iters)]
        )
        for _ in range(2)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    assert int(counter.read_text()) == 2 * iters


# ---------------------------------------------------------------------------
# 2. Sink end-to-end: a SECOND SparkSession process appends batches while
#    this process loops full-table rewrites (rmw) on the same table. Every
#    appended row must survive — an append can never land in a version
#    directory the rewrite just retired.
# ---------------------------------------------------------------------------

_APPEND_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1g"
    from migrator_spark.session import get_spark
    from migrator_spark.sources.parquet import ParquetSource

    root, batches, rows = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = get_spark("mp-lock-appender", cpus=2)
    spark.sparkContext.setLogLevel("ERROR")
    src = ParquetSource(root)
    for b in range(batches):
        lo = 1000 + b * rows
        df = spark.range(lo, lo + rows).selectExpr("id AS k", "id * 2 AS v")
        src.write(df, "t", mode="append")
    spark.stop()
    """
)


def test_concurrent_append_and_rewrite_two_processes(spark, tmp_path):
    from migrator_spark.sources.parquet import ParquetSource

    root = str(tmp_path / "store")
    src = ParquetSource(root)
    base = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    src.write(base, "t", mode="overwrite")

    batches, rows = 6, 10
    env = dict(os.environ)
    child = subprocess.Popen(
        [sys.executable, "-c", _APPEND_WORKER.format(repo=REPO),
         root, str(batches), str(rows)],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    # Identity rewrites race the child's appends; under the flock each
    # rewrite either sees an append (and carries it) or runs before it.
    deadline = time.time() + 300
    while child.poll() is None and time.time() < deadline:
        src.rmw(spark, "t", lambda df: df)
    assert child.wait(timeout=300) == 0

    final = spark.read.parquet(os.path.realpath(f"{root}/t.parquet"))
    got = {r[0] for r in final.select("k").collect()}
    expected = set(range(100)) | {
        1000 + b * rows + i for b in range(batches) for i in range(rows)
    }
    missing = expected - got
    assert not missing, f"lost {len(missing)} appended/base rows: {sorted(missing)[:10]}"
    assert got == expected
