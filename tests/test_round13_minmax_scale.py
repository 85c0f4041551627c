"""Round 13 (VERDICT r12 #3): structural pins for the min/max rollup's
data term — the scoped recompute's two file-pruning claims made
executable, not just plan-text:

* the TARGET read skips row groups on a group-clustered target: the
  pushed-down IN filter (plan-pinned in test_plans.py) actually causes
  the parquet reader to emit only the touched groups' rows, measured
  via the scan node's numOutputRows (AQE off so the metric is
  reachable);
* the ROLLUP-table update file-prunes exactly like the sum path:
  a localized batch's min/max apply goes through merge_pruned and the
  new rollup version carries keep- hardlinks for untouched files.

The measured sum-vs-max cost crossover at widened fixtures lives in
SCALE.md (tools/rollup_cost_probe.py).
"""

from __future__ import annotations

import os
from unittest import mock

from pyspark.sql import functions as F

from migrator_spark.pipeline.runner import Migrator
from migrator_spark.sources.parquet import ParquetSource
from tests.test_rollup_runner import _enqueue, _mini_cfg, _mini_src_tgt


def _scan_rows(spark, df) -> int:
    """numOutputRows of the (single) parquet scan after execution —
    what the reader actually emitted post row-group skipping. AQE is
    disabled for the probe because its ResultQueryStage wrapper hides
    leaf metrics from collectLeaves."""
    df.collect()
    ep = df._jdf.queryExecution().executedPlan()
    leaves = ep.collectLeaves()
    rows = []
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.nodeName().strip().startswith("Scan parquet"):
            rows.append(int(node.metrics().apply("numOutputRows").value()))
    assert rows, ep.toString()
    return max(rows)


def test_scoped_read_skips_rowgroups_on_clustered_target(spark, tmp_path):
    from migrator_spark.operators.maintenance import scoped_minmax_recompute

    n, segs = 100_000, 5
    base = spark.range(n).select(
        F.concat(F.lit("seg"), (F.col("id") % segs).cast("string")).alias("seg"),
        F.col("id").cast("decimal(18,2)").alias("v"),
    )
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    base.repartitionByRange(segs, "seg").sortWithinPartitions("seg").write.parquet(
        clustered
    )
    base.repartition(segs).write.parquet(scattered)  # every file holds all segs
    groups = spark.createDataFrame([("seg2",)], "seg string")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        read_clustered = _scan_rows(
            spark,
            scoped_minmax_recompute(
                spark.read.parquet(clustered), groups, ["seg"], "v", "max", ["seg2"]
            ),
        )
        read_scattered = _scan_rows(
            spark,
            scoped_minmax_recompute(
                spark.read.parquet(scattered), groups, ["seg"], "v", "max", ["seg2"]
            ),
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    touched = n // segs
    # clustered: the reader emits only the touched group's row groups
    assert read_clustered == touched, (read_clustered, touched)
    # control: without clustering the same filter cannot skip anything
    assert read_scattered == n, (read_scattered, n)


def test_minmax_apply_file_prunes_rollup_on_localized_batch(
    spark, sf_dir, tmp_path
):
    """Mirror of the sum path's hardlink pin for the MIN/MAX apply: a
    localized batch rewrites only the rollup part-files whose footer
    range intersects the touched groups; the rest carry forward as
    keep- hardlinks."""
    from migrator_spark.pipeline import runner as runner_mod

    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    cfg.migrations[0].iterations[0].rollups = [
        {"name": "by_cust", "group_by": ["c_custkey"], "max": "c_acctbal"}
    ]
    with mock.patch.object(runner_mod, "ROLLUP_GROUPS_PER_FILE", 8):
        m = Migrator(spark, cfg, trk)
        m.run_until_drained()  # seed: 40 groups / 8 per file = 5 files

        _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "UPDATE")])
        m.run_until_drained()  # localized: 2 adjacent keys of 40

    ps = ParquetSource(tgt)
    cur = ps._current_dir("customer__rollup_by_cust")
    kept = [f for f in os.listdir(cur) if f.startswith("keep-")]
    assert kept, sorted(os.listdir(cur))
    # and the result is still the full recompute's answer
    got = sorted(
        tuple(r)
        for r in ps.table(spark, "customer__rollup_by_cust")
        .select("c_custkey", "max_val", "n_rows")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in ps.table(spark, "customer")
        .groupBy("c_custkey")
        .agg(
            F.max(F.col("c_acctbal").cast("decimal(18,2)")).alias("max_val"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .collect()
    )
    assert got == want
