"""Runner-maintained rollups (round 10): config `rollups` keeps an
aggregate of the target fresh per drained batch at O(batch) cost, with
EXACTLY-ONCE effect under the runner's at-least-once batch replay.

The staged-delta protocol's crash windows are each exercised with a
real injected failure + replay:
  * loader fails AFTER the delta was staged (crash between stage and
    load) -> replay re-uses/re-stages, no loss;
  * apply fails AFTER the load committed (the critical window: the
    pre-batch target state is gone) -> replay REUSES the staged
    delta, no loss and no double-count.
Ground truth is always a full recompute from the final target table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from migrator_spark.operators.maintenance import compute_rollup
from migrator_spark.pipeline.config import (
    IterationSpec,
    MigrationSpec,
    MigratorConfig,
    Parameters,
)
from migrator_spark.pipeline.loaders import load_default
from migrator_spark.pipeline.registries import register_loader
from migrator_spark.pipeline.runner import Migrator
from migrator_spark.plans import cdc as cdc_plans
from migrator_spark.sources.parquet import ParquetSource

ROLLUP = {"name": "by_segment", "group_by": ["c_mktsegment"], "sum": "c_acctbal"}


def _cfg(src_dir: str, tgt_dir: str, n_queue: int, loader: str = "default"):
    return MigratorConfig(
        migrations=[
            MigrationSpec(
                source_dsn=src_dir,
                target_dsn=tgt_dir,
                iterations=[
                    IterationSpec(
                        source_table="customer",
                        source_key="c_custkey",
                        target_table="customer",
                        merge_key="c_custkey",
                        extractor="queue",
                        loader=loader,
                        rollups=[dict(ROLLUP)],
                    )
                ],
            )
        ],
        parameters=Parameters(batch_size=max(1, -(-n_queue // 4))),
    )


def _clone_fixture(spark, sf_dir, tmp_path):
    import shutil

    fx_root, n_queue = cdc_plans._pipeline_fixture(spark, sf_dir)
    root = str(tmp_path)
    shutil.copytree(f"{fx_root}/a", f"{root}/a", symlinks=True)
    shutil.copytree(f"{fx_root}/b", f"{root}/b", symlinks=True)
    return f"{root}/a", f"{root}/b", f"{root}/trk", n_queue


def _rollup_rows(spark, tgt_dir):
    df = ParquetSource(tgt_dir).table(spark, "customer__rollup_by_segment")
    return sorted(
        (r["c_mktsegment"], float(r["sum_val"]), r["n_rows"])
        for r in df.collect()
    )


def _recompute_rows(spark, tgt_dir):
    tgt = ParquetSource(tgt_dir).table(spark, "customer")
    df = compute_rollup(
        tgt.select(
            "c_mktsegment", F.col("c_acctbal").cast("decimal(18,2)").alias("v")
        ),
        ["c_mktsegment"],
        "v",
    )
    return sorted(
        (r["c_mktsegment"], float(r["sum_val"]), r["n_rows"])
        for r in df.collect()
    )


def test_runner_rollup_equals_recompute_over_multibatch_drain(
    spark, sf_dir, tmp_path
):
    """Happy path: a ~4-cycle mixed REPLACE/REMOVE drain keeps the
    rollup bit-equal to a recompute of the final target — group
    migration (upserts moving keys into new segments), deletes, and
    inserts all flow through the patch."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    total = Migrator(spark, _cfg(src, tgt, n_queue), trk).run_until_drained()
    assert total >= 4
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)
    # seq advanced once per applied batch (bootstrap=1, then +1 each)
    seq = (
        ParquetSource(tgt)
        .table(spark, "customer__rollup_by_segment")
        .agg(F.max("_seq"))
        .first()[0]
    )
    assert seq >= 4


_FLAKY_CALLS = {"n": 0}


@register_loader("flaky_default")
def _flaky_loader(spark, target, table, batch, it, params):
    """Fails the FIRST call after rollup staging already happened —
    the crash-between-stage-and-load window."""
    _FLAKY_CALLS["n"] += 1
    if _FLAKY_CALLS["n"] == 1:
        raise RuntimeError("injected loader crash (post-staging)")
    load_default(spark, target, table, batch, it, params)


def test_rollup_survives_crash_between_stage_and_load(spark, sf_dir, tmp_path):
    _FLAKY_CALLS["n"] = 0
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    errors = []
    cfg = _cfg(src, tgt, n_queue, loader="flaky_default")
    Migrator(
        spark, cfg, trk, error_callback=lambda s, e, c: errors.append(s)
    ).run_until_drained()
    assert errors == ["load"]  # first cycle crashed, drain stopped
    # replay: a fresh runner drains to quiescence; nothing lost or doubled
    Migrator(spark, cfg, trk).run_until_drained()
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


def test_rollup_survives_crash_between_load_and_apply(spark, sf_dir, tmp_path):
    """The critical window: the loader already merged the batch (the
    pre-batch target state is GONE), then the rollup apply crashes.
    The replay must reuse the staged write-ahead delta — recomputing
    it from the post-load target would yield a zero delta and silently
    lose the batch's contribution."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    errors = []
    m = Migrator(
        spark, cfg, trk, error_callback=lambda s, e, c: errors.append(s)
    )
    # first drain runs clean (bootstrap + a patched batch), so a staged
    # delta protocol is in force; then crash the NEXT apply
    first_more, first_failed = m._run_batch(
        m.iterations[0], cfg.parameters
    )
    assert first_more and not first_failed

    real_apply = m._apply_rollups
    crashed = {"n": 0}

    def crash_once(b, spec, staged):
        if crashed["n"] == 0:
            crashed["n"] += 1
            raise RuntimeError("injected apply crash (post-load)")
        real_apply(b, spec, staged)

    m._apply_rollups = crash_once
    more, failed = m._run_batch(m.iterations[0], cfg.parameters, strict=False)
    assert failed and crashed["n"] == 1
    m._apply_rollups = real_apply
    # replay the batch and drain the remainder
    m.run_until_drained()
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


def test_rollup_replay_after_full_apply_does_not_double_count(
    spark, sf_dir, tmp_path
):
    """Crash AFTER apply but BEFORE the offset commit (so the queue is
    not yet cleaned either): the batch replays in full — extract of
    the same queue slice, idempotent re-load — and the published seq
    makes the replay's re-staged delta zero. The rollup must not
    double-count."""
    import pytest

    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    m = Migrator(spark, cfg, trk)
    it = m.iterations[0]
    m._run_batch(it, cfg.parameters)  # batch 1 clean (bootstrap)

    real_put = m.store.put
    calls = {"n": 0}

    def put_once(rec):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("injected crash before offset commit")
        real_put(rec)

    m.store.put = put_once
    with pytest.raises(RuntimeError, match="before offset commit"):
        m._run_batch(it, cfg.parameters)  # load + apply DONE, no commit
    m.store.put = real_put
    m._run_batch(it, cfg.parameters)  # full replay of the same batch
    m.run_until_drained()
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


def test_rollups_yaml_shape_parses():
    from migrator_spark.pipeline.config import from_dict

    cfg = from_dict(
        {
            "migrations": [
                {
                    "source": {"dsn": "parquet:///a", "table": "x", "key": "id"},
                    "target": {"dsn": "parquet:///b"},
                    "extractor": "queue",
                    "rollups": [
                        {"name": "g", "group-by": "grp,seg", "sum": "amount"}
                    ],
                }
            ]
        }
    )
    rl = cfg.migrations[0].iterations[0].rollups[0]
    assert rl == {"name": "g", "group_by": ["grp", "seg"], "sum": "amount"}


def test_rollup_protocol_is_loader_agnostic_pruned(spark, sf_dir, tmp_path):
    """The staged-delta protocol sits above the loader seam: the same
    drain through the file-pruned merge loader keeps the rollup equal
    to the recompute."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    Migrator(
        spark, _cfg(src, tgt, n_queue, loader="pruned"), trk
    ).run_until_drained()
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


def test_multiple_rollups_maintained_independently(spark, sf_dir, tmp_path):
    """Two rollups on one iteration each stay equal to their own
    recompute (independent staging/seq chains)."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    cfg.migrations[0].iterations[0].rollups.append(
        {"name": "by_nation", "group_by": ["c_nationkey"], "sum": "c_acctbal"}
    )
    Migrator(spark, cfg, trk).run_until_drained()
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)
    tgt_df = ParquetSource(tgt).table(spark, "customer")
    want = sorted(
        (r["c_nationkey"], float(r["sum_val"]), r["n_rows"])
        for r in compute_rollup(
            tgt_df.select(
                "c_nationkey",
                F.col("c_acctbal").cast("decimal(18,2)").alias("v"),
            ),
            ["c_nationkey"],
            "v",
        ).collect()
    )
    got = sorted(
        (r["c_nationkey"], float(r["sum_val"]), r["n_rows"])
        for r in ParquetSource(tgt)
        .table(spark, "customer__rollup_by_nation")
        .collect()
    )
    assert got == want
