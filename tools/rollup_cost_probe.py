"""Measure the min/max rollup's DATA term vs the sum delta (round 13,
VERDICT r12 #3).

The r12 rollup-cost row showed max upkeep FLAT at sf0.1 because the
scoped recompute's O(target rows in touched groups) term is invisible
under the fixed per-batch protocol overhead (~1 s: staged + applied
table publications). This probe WIDENS the fixture until the data term
dominates: the target is the sf0.1 customer slice replicated xK with
unique keys, the rollup groups by c_mktsegment (5 groups — every batch
touches ALL of them, so each max apply re-aggregates the ENTIRE
target: the adversarial high-fanout shape), and the sum variant runs
the identical drain for the O(batch)-delta baseline.

Protocol (matches SCALE.md's r10/r12 rollup-cost rows): 5-batch queue
drain, per-variant fresh fixture, warm plans (one throwaway drain
first), median of N_REPS drains, same box/day; `bare` (no rollup) is
measured so per-batch overheads read net of the drain itself.

Usage: python tools/rollup_cost_probe.py [K ...]   (default 1 4 16)
Prints one JSON line per (K, variant) with total/per-batch seconds.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from datetime import datetime, timedelta
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from migrator_spark.pipeline.config import (  # noqa: E402
    IterationSpec,
    MigrationSpec,
    MigratorConfig,
    Parameters,
)
from migrator_spark.pipeline.runner import Migrator  # noqa: E402
from migrator_spark.session import get_spark  # noqa: E402
from migrator_spark.sources.parquet import ParquetSource  # noqa: E402
from migrator_spark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N_BATCHES = 5
BATCH_KEYS = 50
N_REPS = 3

VARIANTS = {
    "bare": [],
    "sum_seg": [{"name": "seg", "group_by": ["c_mktsegment"], "sum": "c_acctbal"}],
    "max_seg": [{"name": "seg", "group_by": ["c_mktsegment"], "max": "c_acctbal"}],
}


def build_fixture(spark, k: int, root: str) -> list[int]:
    """Source+target stores holding customer xK (unique keys); returns
    the queue keys (spread across the key range -> every batch touches
    every segment)."""
    customer = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    big = customer.crossJoin(
        spark.range(k).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("c_custkey") + F.col("_rep") * 1_000_000).alias("c_custkey"),
        "c_mktsegment",
        (F.col("c_acctbal") + F.col("_rep")).cast("decimal(12,2)").alias(
            "c_acctbal"
        ),
    )
    src, tgt = ParquetSource(f"{root}/a"), ParquetSource(f"{root}/b")
    src.write(big.withColumn("c_acctbal", F.col("c_acctbal") + 1000), "customer")
    tgt.write(big, "customer")
    n_rows = 15_000 * k  # sf0.1 customer
    step = max(1, n_rows // (N_BATCHES * BATCH_KEYS))
    keys = [1 + i * step for i in range(N_BATCHES * BATCH_KEYS)]
    rows = [
        ("a", "customer", "c_custkey", str(kk),
         datetime(2024, 1, 1) + timedelta(seconds=i), "UPDATE")
        for i, kk in enumerate(keys)
    ]
    src.write(
        spark.createDataFrame(
            rows,
            "sourceDatabase string, sourceTable string, pkColumn string, "
            "pkValue string, timestampUpdated timestamp, method string",
        ),
        "MigratorRecordQueue",
    )
    return keys


def drain_secs(spark, fixture_root: str, rollups: list, run_id: str) -> float:
    work = tempfile.mkdtemp(prefix=f"rcp_{run_id}_")
    try:
        shutil.copytree(f"{fixture_root}/a", f"{work}/a", symlinks=True)
        shutil.copytree(f"{fixture_root}/b", f"{work}/b", symlinks=True)
        cfg = MigratorConfig(
            migrations=[
                MigrationSpec(
                    source_dsn=f"{work}/a",
                    target_dsn=f"{work}/b",
                    iterations=[
                        IterationSpec(
                            source_table="customer",
                            source_key="c_custkey",
                            target_table="customer",
                            merge_key="c_custkey",
                            extractor="queue",
                            rollups=[dict(r) for r in rollups],
                        )
                    ],
                )
            ],
            parameters=Parameters(batch_size=BATCH_KEYS),
        )
        t0 = time.perf_counter()
        Migrator(spark, cfg, f"{work}/trk").run_until_drained()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("rollup-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        froot = tempfile.mkdtemp(prefix=f"rcpfx_{k}_")
        try:
            build_fixture(spark, k, froot)
            for name, rollups in VARIANTS.items():
                drain_secs(spark, froot, rollups, "warm")  # plan warm-up
                walls = [
                    drain_secs(spark, froot, rollups, f"r{i}")
                    for i in range(N_REPS)
                ]
                med = statistics.median(walls)
                print(
                    json.dumps(
                        {
                            "k": k,
                            "target_rows": 15_000 * k,
                            "variant": name,
                            "median_s": round(med, 2),
                            "per_batch_s": round(med / N_BATCHES, 3),
                            "walls": [round(w, 2) for w in walls],
                        }
                    ),
                    flush=True,
                )
        finally:
            shutil.rmtree(froot, ignore_errors=True)


if __name__ == "__main__":
    main()
