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

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from migrator_spark.operators.maintenance import compute_rollup
from migrator_spark.pipeline.config import (
    IterationSpec,
    MigrationSpec,
    MigratorConfig,
    Parameters,
)
from migrator_spark.pipeline.loaders import load_default
from migrator_spark.pipeline.registries import register_loader, register_transformer
from migrator_spark.pipeline.runner import Migrator
from migrator_spark.pipeline.transformers import Routed
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


def _null_safe_sort(rows):
    return sorted(rows, key=lambda t: ((t[0] is None, t[0]), t[1:]))


def _rollup_rows(spark, tgt_dir):
    df = ParquetSource(tgt_dir).table(spark, "customer__rollup_by_segment")
    return _null_safe_sort(
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
    return _null_safe_sort(
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


_FLAKY_CALLS = {"n": 0, "crash_at": 1}


@register_loader("flaky_default")
def _flaky_loader(spark, target, table, batch, it, params):
    """Fails the call numbered ``crash_at`` after rollup staging already
    happened — the crash-between-stage-and-load window."""
    _FLAKY_CALLS["n"] += 1
    if _FLAKY_CALLS["n"] == _FLAKY_CALLS["crash_at"]:
        raise RuntimeError("injected loader crash (post-staging)")
    load_default(spark, target, table, batch, it, params)


def test_rollup_survives_crash_between_stage_and_load(spark, sf_dir, tmp_path):
    """ADVICE r10 #3: the crash must hit a batch whose staging wrote a
    REAL staged delta (batch >= 2 — batch 1 takes the seq==0 recompute
    path and stages nothing), so the replay exercises reuse of a
    write-ahead delta that exists on disk before any load of its
    batch."""
    # crash the SECOND loader call: batch 1 runs clean (recompute,
    # publishes seq 1), batch 2 stages delta seq 2 then its load crashes
    _FLAKY_CALLS.update(n=0, crash_at=2)
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    errors = []
    cfg = _cfg(src, tgt, n_queue, loader="flaky_default")
    Migrator(
        spark, cfg, trk, error_callback=lambda s, e, c: errors.append(s)
    ).run_until_drained()
    assert errors == ["load"]  # second cycle crashed, drain stopped
    # the staged write-ahead delta for seq 2 exists BEFORE any load of
    # its batch — the window the crash claims to exercise
    staged = ParquetSource(tgt).table(
        spark, "customer__rollup_by_segment__staged"
    )
    assert staged.agg(F.max("_seq")).first()[0] == 2
    # replay: a fresh runner drains to quiescence; the identical batch's
    # fingerprint matches, so the staged delta is REUSED (not recomputed)
    m2 = Migrator(spark, cfg, trk)
    stage_records = []
    orig_stage = m2._stage_rollups

    def spy(b, spec, routed):
        out = orig_stage(b, spec, routed)
        stage_records.append(out)
        return out

    m2._stage_rollups = spy
    m2.run_until_drained()
    assert stage_records[0][0]["seq"] == 2
    assert stage_records[0][0]["recompute"] is False  # reused, as designed
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


# ------------------------------------------------ replayed-slice growth
#
# ADVICE r10 #1: the queue extractor slices the oldest batch_size rows;
# if a PARTIAL tail batch is staged, its load or apply crashes, and new
# queue rows arrive before the replay, the replayed slice GROWS. The
# staged delta then describes a different batch — reusing it would merge
# and queue-clean the full new slice while patching only the old rows'
# contributions (silent, permanent divergence). The fingerprint staged
# alongside _seq detects this; the fallback is a FULL post-load
# recompute, because a recomputed *delta* is wrong whenever the crashed
# attempt's load already committed (see runner.py protocol comment).


def _mini_src_tgt(spark, sf_dir, tmp_path):
    """Small controllable fixture: `customer` slice with source
    balances shifted +1000 and a queue the test APPENDS to between
    cycles, so replayed slices can grow."""
    from migrator_spark.tables import load_table

    customer = (
        load_table(spark, sf_dir, "customer").orderBy("c_custkey").limit(40)
    )
    src_dir, tgt_dir = f"{tmp_path}/a", f"{tmp_path}/b"
    ParquetSource(src_dir).write(
        customer.withColumn("c_acctbal", F.col("c_acctbal") + 1000),
        "customer",
    )
    ParquetSource(tgt_dir).write(customer, "customer")
    return src_dir, tgt_dir, f"{tmp_path}/trk"


def _enqueue(spark, src_dir, entries):
    """entries: [(custkey, ts_offset_sec, method)] appended to the CDC
    queue."""
    rows = [
        (
            "a",
            "customer",
            "c_custkey",
            str(k),
            datetime(2024, 1, 1) + timedelta(seconds=s),
            m,
        )
        for k, s, m in entries
    ]
    df = spark.createDataFrame(
        rows,
        "sourceDatabase string, sourceTable string, pkColumn string, "
        "pkValue string, timestampUpdated timestamp, method string",
    )
    src = ParquetSource(src_dir)
    mode = "append" if src.exists(spark, "MigratorRecordQueue") else "overwrite"
    src.write(df, "MigratorRecordQueue", mode=mode)


def _mini_cfg(src_dir, tgt_dir, loader="default"):
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
        parameters=Parameters(batch_size=4),
    )


def _spy_stage(m):
    records = []
    orig = m._stage_rollups

    def spy(b, spec, routed):
        out = orig(b, spec, routed)
        records.append(out)
        return out

    m._stage_rollups = spy
    return records


def test_rollup_replayed_slice_growth_after_stage_load_crash(
    spark, sf_dir, tmp_path
):
    """Crash in the stage->load window on a partial tail batch, then
    GROW the queue before the replay: the staged delta's fingerprint
    mismatches and the batch recomputes — nothing from the new rows is
    lost (pre-fingerprint code reused the stale delta and permanently
    dropped their contributions)."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    m = Migrator(spark, cfg, trk)
    m.run_until_drained()  # batch A clean: recompute publishes seq 1

    _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "UPDATE")])
    _FLAKY_CALLS.update(n=0, crash_at=1)
    errors = []
    Migrator(
        spark,
        _mini_cfg(src, tgt, loader="flaky_default"),
        trk,
        error_callback=lambda s, e, c: errors.append(s),
    ).run_until_drained()
    assert errors == ["load"]  # staged delta seq 2 exists, load crashed

    # growth: two new arrivals, one re-updating key 2 — replayed slice
    # becomes {3, 4, 5, 2} (batch_size 4), a superset of the staged {3, 4}
    _enqueue(spark, src, [(5, 5, "UPDATE"), (2, 6, "UPDATE")])
    m3 = Migrator(spark, cfg, trk)
    records = _spy_stage(m3)
    m3.run_until_drained()
    assert records[0][0]["seq"] == 2
    assert records[0][0]["recompute"] is True  # fingerprint caught the growth
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


def test_rollup_replayed_slice_growth_after_load_apply_crash(
    spark, sf_dir, tmp_path
):
    """The hard window: the crashed attempt's LOAD already committed
    (pre-batch target state gone), then the replayed slice grows. A
    recomputed DELTA against the post-load target would miss the old
    batch's transition entirely (retract 20 / add 20 for an
    already-loaded key nets zero while the rollup still holds 10) —
    only the full post-load recompute is correct, and this pins it."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    m = Migrator(spark, cfg, trk)
    m.run_until_drained()  # batch A clean: seq 1

    # batch B (partial tail, 2 of 4): load commits, apply crashes
    _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "UPDATE")])
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

    # growth before the replay
    _enqueue(spark, src, [(5, 5, "UPDATE"), (2, 6, "UPDATE")])
    records = _spy_stage(m)
    m.run_until_drained()
    assert records[0][0]["recompute"] is True
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


# --------------------------------------------- transformer routing (r11)


def test_rollup_follows_renamed_target(spark, sf_dir, tmp_path):
    """VERDICT r10 #4: with the tablerenamer transformer, the rollup is
    maintained on the table the rows actually LAND in — pre-r11 the
    `rollups` config silently no-opped because no routed frame matched
    the configured target_table."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    it = cfg.migrations[0].iterations[0]
    it.transformer = "tablerenamer"
    it.transformer_parameters = {"TableName": "customer_renamed"}
    Migrator(spark, cfg, trk).run_until_drained()

    rolled = sorted(
        (r["c_mktsegment"], float(r["sum_val"]), r["n_rows"])
        for r in ParquetSource(tgt)
        .table(spark, "customer_renamed__rollup_by_segment")
        .collect()
    )
    want = sorted(
        (r["c_mktsegment"], float(r["sum_val"]), r["n_rows"])
        for r in compute_rollup(
            ParquetSource(tgt)
            .table(spark, "customer_renamed")
            .select(
                "c_mktsegment",
                F.col("c_acctbal").cast("decimal(18,2)").alias("v"),
            ),
            ["c_mktsegment"],
            "v",
        ).collect()
    )
    assert rolled == want
    # no phantom rollup under the configured-but-unrouted name
    assert not ParquetSource(tgt).exists(spark, "customer__rollup_by_segment")


@register_transformer("split_overlap")
def _split_overlap(batch, ctx):
    """Routes TWO frames to the same target with overlapping keys: the
    later frame carries stale-_order copies of the %4 keys. The loader
    merges frames sequentially, so those rows WIN their keys in the
    final table despite the older _order — the staged delta must mirror
    frame-position precedence or it diverges from the loaded table."""
    even = batch.filter(F.col("c_custkey") % 2 == 0)
    odd = batch.filter(F.col("c_custkey") % 2 == 1)
    dup = (
        even.filter(F.col("c_custkey") % 4 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 55)
        .withColumn("_order", F.expr("timestampadd(SECOND, -100000, _order)"))
    )
    return [
        Routed(even, ctx.target_table),
        Routed(odd.unionByName(dup), ctx.target_table),
    ]


def test_rollup_multi_frame_same_target_unions_all_frames(
    spark, sf_dir, tmp_path
):
    """ADVICE r10 #2: a transformer routing MULTIPLE frames to the
    rollup's table gets ONE combined loader-faithful delta — pre-r11
    only the first matching frame was staged, silently diverging."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    cfg.migrations[0].iterations[0].transformer = "split_overlap"
    Migrator(spark, cfg, trk).run_until_drained()
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


def test_rollup_null_group_key_patches_not_splits(spark, sf_dir, tmp_path):
    """Round 11: a NULL group-by value is a real group to groupBy, so
    the maintained rollup must patch it in place — the pre-fix
    null-unsafe apply join split it into a stale row plus a delta-only
    row. The NULL group also routes the pruned apply to the full
    rewrite (footer stats can't represent NULLs)."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    # poke NULL segments into BOTH sides' low keys so batches touch them
    for d in (src, tgt):
        cur = ParquetSource(d).table(spark, "customer")
        ParquetSource(d).write(
            cur.withColumn(
                "c_mktsegment",
                F.when(F.col("c_custkey") <= 4, F.lit(None)).otherwise(
                    F.col("c_mktsegment")
                ),
            ),
            "customer",
            mode="overwrite",
        )
    cfg = _mini_cfg(src, tgt)
    m = Migrator(spark, cfg, trk)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (7, 2, "UPDATE")])
    m.run_until_drained()  # seq 1 recompute (NULL group present)
    _enqueue(spark, src, [(2, 3, "UPDATE"), (3, 4, "REMOVE"), (8, 5, "UPDATE")])
    m.run_until_drained()  # seq 2 DELTA patch touches the NULL group
    rows = _rollup_rows(spark, tgt)
    null_rows = [t for t in rows if t[0] is None]
    assert len(null_rows) == 1, rows  # patched in place, never split
    assert rows == _recompute_rows(spark, tgt)


# ------------------------------------------------- pruned apply (r11)


def test_rollup_apply_file_prunes_high_cardinality(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r10 #3: the delta APPLY must not rewrite the whole
    rollup table per batch. With a high-cardinality group key
    (c_custkey — one group per customer) and the recompute seeding the
    table range-clustered across multiple files, each batch's apply
    goes through ParquetSource.merge_pruned: part-files outside the
    touched key ranges are carried forward as hardlinks ("keep-"
    files), so apply I/O is O(files containing touched groups)."""
    from migrator_spark.pipeline import runner as runner_mod

    monkeypatch.setattr(runner_mod, "ROLLUP_GROUPS_PER_FILE", 8)
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    # batch A seeds the recompute: 40 customers / 8 per file = 5 files
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    cfg.migrations[0].iterations[0].rollups = [
        {"name": "by_cust", "group_by": ["c_custkey"], "sum": "c_acctbal"}
    ]
    m = Migrator(spark, cfg, trk)
    m.run_until_drained()
    import os

    def _current_files():
        cur = ParquetSource(tgt)._current_dir("customer__rollup_by_cust")
        return sorted(
            f for f in os.listdir(cur) if f.endswith(".parquet")
        )

    seeded = _current_files()
    assert len(seeded) >= 4, seeded  # range-clustered multi-file seed

    # batch B touches two adjacent keys -> at most a couple of files
    # rewrite; the rest carry forward as hardlinked "keep-" files
    _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "UPDATE")])
    m.run_until_drained()
    after = _current_files()
    kept = [f for f in after if f.startswith("keep-")]
    assert kept, after  # pruning engaged: untouched files carried
    assert len(after) - len(kept) <= 2, after  # only touched files rewrote
    # and the patched table still equals a recompute
    got = sorted(
        (r["c_custkey"], float(r["sum_val"]), r["n_rows"])
        for r in ParquetSource(tgt)
        .table(spark, "customer__rollup_by_cust")
        .collect()
    )
    want = sorted(
        (r["c_custkey"], float(r["sum_val"]), r["n_rows"])
        for r in compute_rollup(
            ParquetSource(tgt)
            .table(spark, "customer")
            .select(
                "c_custkey",
                F.col("c_acctbal").cast("decimal(18,2)").alias("v"),
            ),
            ["c_custkey"],
            "v",
        ).collect()
    )
    assert got == want


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
    assert rl == {
        "name": "g",
        "group_by": ["grp", "seg"],
        "agg": "sum",
        "column": "amount",
        "table": None,
    }


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
