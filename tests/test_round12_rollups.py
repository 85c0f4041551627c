"""Round-12 rollup protocol hardening.

* VERDICT r11 #1 / ADVICE r11 #1 — the stage fingerprint covers the
  batch's PAYLOAD columns: a crashed slice replayed after one of its
  rows' live source values changed (its newer CDC entry outside the
  slice, identity tuples identical) must mismatch and take the full
  post-load recompute, not silently reuse the stale staged delta.
* VERDICT r11 #5 — the aggregate surface: unsupported aggregates fail
  loudly at config/bind time; min/max are maintained by the staged-
  touched-groups scoped recompute (retraction-safe), crash-injected.
* VERDICT r11 #6 — single-sequencer enforcement at bind time.
* VERDICT r11 #7 — steady-state batches never run a Spark job over the
  whole rollup table (seq + prune guard come from parquet footers).
* ADVICE r11 #2 — rollups skip routed targets whose frames lack their
  columns; an explicit `table:` pin; a pinned-but-missing-columns
  config error.
* ADVICE r11 #3 — the full-rewrite apply path re-range-clusters, so
  one spread batch does not permanently destroy file pruning.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators.maintenance import compute_rollup
from migrator_spark.pipeline.config import normalize_rollup
from migrator_spark.pipeline.runner import Migrator
from migrator_spark.pipeline.transformers import Routed
from migrator_spark.pipeline.registries import register_transformer
from migrator_spark.sources.parquet import ParquetSource
from tests.test_rollup_runner import (
    _FLAKY_CALLS,
    _cfg,
    _clone_fixture,
    _enqueue,
    _mini_cfg,
    _mini_src_tgt,
    _recompute_rows,
    _rollup_rows,
    _spy_stage,
)

# ------------------------------------------------- payload fingerprint


def test_stage_fingerprint_catches_live_value_change_under_full_slice(
    spark, sf_dir, tmp_path
):
    """VERDICT r11 #1's prescribed crash test: stage -> load crash ->
    UPDATE a staged row's source value, with the new CDC entry landing
    OUTSIDE the replayed slice (slice stays byte-identical in identity
    terms: same keys, same _order, same _tie, same method) -> replay.
    The queue extractor re-reads the LIVE row, so the resolved batch
    carries the NEW value; the payload-covering fingerprint mismatches
    and the batch takes the full post-load recompute. The r11
    identity-only fingerprint matched here, reused the stale staged
    delta, and the rollup silently diverged — permanently, because the
    later entry's own batch retracts the target's actual (new) value
    for a net zero."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    m = Migrator(spark, cfg, trk)
    m.run_until_drained()  # batch A clean: recompute publishes seq 1

    # batch B: keys {3, 4} stage delta seq 2, then the load crashes
    _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "UPDATE")])
    _FLAKY_CALLS.update(n=0, crash_at=1)
    errors = []
    Migrator(
        spark,
        _mini_cfg(src, tgt, loader="flaky_default"),
        trk,
        error_callback=lambda s, e, c: errors.append(s),
    ).run_until_drained()
    assert errors == ["load"]

    # key 3's source value changes AFTER the crash; its new CDC entry
    # has a LATER timestamp, so with batch_size=4 the replayed slice's
    # oldest-4 = {3, 4, 5, 3'} — but crucially rows (3,ts3) and (4,ts4)
    # re-resolve against the LIVE source, now carrying the new balance
    psrc = ParquetSource(src)
    cust = psrc.table(spark, "customer")
    psrc.write(
        cust.withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") == 3, F.col("c_acctbal") + 777).otherwise(
                F.col("c_acctbal")
            ),
        ),
        "customer",
        mode="overwrite",
    )
    _enqueue(spark, src, [(3, 9, "UPDATE")])

    m3 = Migrator(spark, cfg, trk)
    records = _spy_stage(m3)
    m3.run_until_drained()
    assert records[0][0]["seq"] == 2
    # the payload fingerprint caught the value change -> full recompute
    assert records[0][0]["recompute"] is True
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


def test_stage_fingerprint_still_reuses_identical_replay(
    spark, sf_dir, tmp_path
):
    """The payload widening must NOT break the mandatory reuse window:
    an identical replayed batch (values untouched) still reuses the
    staged write-ahead delta."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    Migrator(spark, cfg, trk).run_until_drained()

    _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "UPDATE")])
    _FLAKY_CALLS.update(n=0, crash_at=1)
    errors = []
    Migrator(
        spark,
        _mini_cfg(src, tgt, loader="flaky_default"),
        trk,
        error_callback=lambda s, e, c: errors.append(s),
    ).run_until_drained()
    assert errors == ["load"]

    m3 = Migrator(spark, cfg, trk)
    records = _spy_stage(m3)
    m3.run_until_drained()
    assert records[0][0]["seq"] == 2
    assert records[0][0]["recompute"] is False  # reused, as designed
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)


# ------------------------------------------------ aggregate surface


def test_unsupported_aggregate_fails_loudly():
    # avg: was rejected-with-advice in r12; r13 made it config sugar
    # over the (sum, count) pair (VERDICT r12 #8, test_round13_avg) —
    # it now normalizes instead of raising
    assert normalize_rollup({"name": "r", "group_by": ["g"], "avg": "x"})[
        "agg"
    ] == "avg"
    with pytest.raises(ValueError, match="unsupported key.*median"):
        normalize_rollup({"name": "r", "group_by": ["g"], "median": "x"})
    with pytest.raises(ValueError, match="unsupported agg"):
        normalize_rollup(
            {"name": "r", "group_by": ["g"], "agg": "median", "column": "x"}
        )
    with pytest.raises(ValueError, match="exactly one aggregate"):
        normalize_rollup({"name": "r", "group_by": ["g"]})
    with pytest.raises(ValueError, match="exactly one aggregate"):
        normalize_rollup({"name": "r", "group_by": ["g"], "sum": "x", "min": "y"})
    with pytest.raises(ValueError, match="empty group-by"):
        normalize_rollup({"name": "r", "sum": "x"})


def test_minmax_shorthand_normalizes():
    rl = normalize_rollup({"name": "m", "group-by": "g", "min": "v"})
    assert rl == {
        "name": "m",
        "group_by": ["g"],
        "agg": "min",
        "column": "v",
        "table": None,
    }


def _minmax_recompute(spark, tgt_dir, agg, table="customer"):
    fn = F.min if agg == "min" else F.max
    df = (
        ParquetSource(tgt_dir)
        .table(spark, table)
        .groupBy("c_mktsegment")
        .agg(
            fn(F.col("c_acctbal").cast("decimal(18,2)")).alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return sorted(
        ((r["c_mktsegment"] or ""), float(r["v"]), r["n"]) for r in df.collect()
    )


def _minmax_rows(spark, tgt_dir, agg, name):
    df = ParquetSource(tgt_dir).table(spark, f"customer__rollup_{name}")
    return sorted(
        ((r["c_mktsegment"] or ""), float(r[f"{agg}_val"]), r["n_rows"])
        for r in df.collect()
    )


@pytest.mark.parametrize("agg", ["min", "max"])
def test_minmax_rollup_drain_equals_recompute(spark, sf_dir, tmp_path, agg):
    """Happy path: a mixed UPDATE/REMOVE multi-batch drain keeps the
    min/max rollup equal to a recompute — including RETRACTIONS of the
    current extremum (REMOVEs and group migrations), the case the sum
    delta algebra cannot express and the scoped recompute exists for."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    cfg.migrations[0].iterations[0].rollups = [
        {"name": f"seg_{agg}", "group_by": ["c_mktsegment"], agg: "c_acctbal"}
    ]
    total = Migrator(spark, cfg, trk).run_until_drained()
    assert total >= 4
    assert _minmax_rows(spark, tgt, agg, f"seg_{agg}") == _minmax_recompute(
        spark, tgt, agg
    )


def test_max_rollup_retraction_of_current_max(spark, sf_dir, tmp_path):
    """The sharpest retraction: REMOVE the row that holds a group's
    current maximum. The new max lives in rows no delta ever saw; the
    scoped recompute must find it."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    cfg = _mini_cfg(src, tgt)
    cfg.migrations[0].iterations[0].rollups = [
        {"name": "seg_max", "group_by": ["c_mktsegment"], "max": "c_acctbal"}
    ]
    m = Migrator(spark, cfg, trk)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    m.run_until_drained()  # seq 1 recompute
    # find the current max-holder of some segment in the TARGET table
    tgt_df = ParquetSource(tgt).table(spark, "customer")
    top = (
        tgt_df.orderBy(F.col("c_acctbal").desc())
        .select("c_custkey", "c_mktsegment")
        .first()
    )
    _enqueue(spark, src, [(int(top["c_custkey"]), 5, "REMOVE")])
    m.run_until_drained()  # scoped recompute must re-find the group max
    assert _minmax_rows(spark, tgt, "max", "seg_max") == _minmax_recompute(
        spark, tgt, "max"
    )


@pytest.mark.parametrize("window", ["load", "apply"])
def test_minmax_rollup_survives_crashes(spark, sf_dir, tmp_path, window):
    """Crash injection in both protocol windows; the replay unions the
    leftover staged group set with its own and the scoped recompute is
    idempotent, so the rollup lands on the recompute either way — even
    with queue GROWTH between crash and replay (no fingerprint needed)."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    cfg = _mini_cfg(src, tgt)
    cfg.migrations[0].iterations[0].rollups = [
        {"name": "seg_min", "group_by": ["c_mktsegment"], "min": "c_acctbal"}
    ]
    m = Migrator(spark, cfg, trk)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    m.run_until_drained()  # seq 1

    _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "REMOVE")])
    if window == "load":
        _FLAKY_CALLS.update(n=0, crash_at=1)
        errors = []
        flaky_cfg = _mini_cfg(src, tgt, loader="flaky_default")
        flaky_cfg.migrations[0].iterations[0].rollups = [
            {"name": "seg_min", "group_by": ["c_mktsegment"], "min": "c_acctbal"}
        ]
        Migrator(
            spark, flaky_cfg, trk, error_callback=lambda s, e, c: errors.append(s)
        ).run_until_drained()
        assert errors == ["load"]
    else:
        real_apply = m._apply_rollups
        crashed = {"n": 0}

        def crash_once(b, spec, staged):
            if crashed["n"] == 0:
                crashed["n"] += 1
                raise RuntimeError("injected apply crash (post-load)")
            real_apply(b, spec, staged)

        m._apply_rollups = crash_once
        _more, failed = m._run_batch(m.iterations[0], cfg.parameters, strict=False)
        assert failed
        m._apply_rollups = real_apply

    # growth before the replay: a new key and a re-update of key 3
    _enqueue(spark, src, [(5, 6, "UPDATE"), (3, 7, "UPDATE")])
    m2 = Migrator(spark, cfg, trk)
    m2.run_until_drained()
    assert _minmax_rows(spark, tgt, "min", "seg_min") == _minmax_recompute(
        spark, tgt, "min"
    )


def test_minmax_rollup_null_group(spark, sf_dir, tmp_path):
    """NULL is a real group to groupBy; the scoped recompute's
    null-safe joins must patch it in place, not split or drop it."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
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
    cfg.migrations[0].iterations[0].rollups = [
        {"name": "seg_max", "group_by": ["c_mktsegment"], "max": "c_acctbal"}
    ]
    m = Migrator(spark, cfg, trk)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (7, 2, "UPDATE")])
    m.run_until_drained()  # seq 1 recompute (NULL group present)
    _enqueue(spark, src, [(2, 3, "UPDATE"), (3, 4, "REMOVE"), (8, 5, "UPDATE")])
    m.run_until_drained()  # seq 2 scoped recompute touches the NULL group
    rows = ParquetSource(tgt).table(spark, "customer__rollup_seg_max").collect()
    null_rows = [r for r in rows if r["c_mktsegment"] is None]
    assert len(null_rows) == 1, rows
    assert _minmax_rows(spark, tgt, "max", "seg_max") == _minmax_recompute(
        spark, tgt, "max"
    )


# ------------------------------------------------ single sequencer


def _two_iteration_cfg(src_dir, tgt_dir, rollups_a, rollups_b):
    from migrator_spark.pipeline.config import (
        IterationSpec,
        MigrationSpec,
        MigratorConfig,
    )

    def it(rollups):
        return IterationSpec(
            source_table="customer",
            source_key="c_custkey",
            target_table="customer",
            merge_key="c_custkey",
            extractor="queue",
            rollups=list(rollups),
        )

    return MigratorConfig(
        migrations=[
            MigrationSpec(
                source_dsn=src_dir,
                target_dsn=tgt_dir,
                iterations=[it(rollups_a), it(rollups_b)],
            )
        ]
    )


ROLLUP = {"name": "by_segment", "group_by": ["c_mktsegment"], "sum": "c_acctbal"}


def test_two_rollup_iterations_one_target_rejected(spark, sf_dir, tmp_path):
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    cfg = _two_iteration_cfg(src, tgt, [dict(ROLLUP)], [dict(ROLLUP)])
    with pytest.raises(ValueError, match="single sequencer"):
        Migrator(spark, cfg, trk)


def test_rollup_less_iteration_on_rollup_target_rejected(spark, sf_dir, tmp_path):
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    cfg = _two_iteration_cfg(src, tgt, [dict(ROLLUP)], [])
    with pytest.raises(ValueError, match="single-sequencer"):
        Migrator(spark, cfg, trk)


def test_distinct_targets_accepted(spark, sf_dir, tmp_path):
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    cfg = _two_iteration_cfg(src, tgt, [dict(ROLLUP)], [])
    cfg.migrations[0].iterations[1].target_table = "customer_other"
    Migrator(spark, cfg, trk)  # no raise


# --------------------------------------------- routed-target skipping


@register_transformer("fanout_side_stats")
def _fanout_side_stats(batch, ctx):
    """Routes the full frame to the main target AND a projected
    (schema-incompatible: no c_acctbal) frame to a side table —
    ADVICE r11 #2's raising/phantom-rollup case."""
    side = batch.select(
        "c_custkey", "c_mktsegment", "_order", "_tie", "_method"
    )
    return [Routed(batch, ctx.target_table), Routed(side, "customer_sidestats")]


def test_fanout_to_distinct_target_schemas_skips_side_table(
    spark, sf_dir, tmp_path
):
    """A fan-out transformer routing a differently-shaped frame to a
    side table must neither raise at stage time nor materialize an
    unintended `<side>__rollup_<name>`; the main target's rollup stays
    correct."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    cfg.migrations[0].iterations[0].transformer = "fanout_side_stats"
    Migrator(spark, cfg, trk).run_until_drained()
    assert _rollup_rows(spark, tgt) == _recompute_rows(spark, tgt)
    ps = ParquetSource(tgt)
    assert ps.exists(spark, "customer_sidestats")
    assert not ps.exists(spark, "customer_sidestats__rollup_by_segment")


def test_rollup_explicit_table_pin(spark, sf_dir, tmp_path):
    """An explicit `table:` pins the rollup to ONE routed target."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    it = cfg.migrations[0].iterations[0]
    it.transformer = "tablerenamer"
    it.transformer_parameters = {"TableName": "customer_renamed"}
    it.rollups = [{**ROLLUP, "table": "customer_renamed"}]
    Migrator(spark, cfg, trk).run_until_drained()
    ps = ParquetSource(tgt)
    assert ps.exists(spark, "customer_renamed__rollup_by_segment")
    got = sorted(
        (r["c_mktsegment"], float(r["sum_val"]), r["n_rows"])
        for r in ps.table(spark, "customer_renamed__rollup_by_segment").collect()
    )
    want = sorted(
        (r["c_mktsegment"], float(r["sum_val"]), r["n_rows"])
        for r in compute_rollup(
            ps.table(spark, "customer_renamed").select(
                "c_mktsegment",
                F.col("c_acctbal").cast("decimal(18,2)").alias("v"),
            ),
            ["c_mktsegment"],
            "v",
        ).collect()
    )
    assert got == want


def test_rollup_pinned_table_missing_columns_raises(spark, sf_dir, tmp_path):
    """A PINNED target whose frames lack the rollup's columns is a
    config error, not a silent skip."""
    src, tgt, trk, n_queue = _clone_fixture(spark, sf_dir, tmp_path)
    cfg = _cfg(src, tgt, n_queue)
    it = cfg.migrations[0].iterations[0]
    it.transformer = "fanout_side_stats"
    it.rollups = [{**ROLLUP, "table": "customer_sidestats"}]
    errors = []
    Migrator(
        spark, cfg, trk, error_callback=lambda s, e, c: errors.append((s, e))
    ).run_until_drained()
    assert errors and "lack its column" in str(errors[0][1])


# --------------------------------- steady-state cost + layout survival


def test_steady_state_batch_never_scans_rollup_table(spark, sf_dir, tmp_path):
    """VERDICT r11 #7: in the steady state (delta-patch path), no Spark
    read of the FULL rollup data table happens — the sequence number
    and the prune guard's group count both come from parquet footers,
    and the apply goes through merge_pruned (footer ranges + touched
    files only). A `.table()` call on the rollup data table IS the
    regression this test pins against."""
    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    from migrator_spark.pipeline import runner as runner_mod

    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    cfg.migrations[0].iterations[0].rollups = [
        {"name": "by_cust", "group_by": ["c_custkey"], "sum": "c_acctbal"}
    ]
    import unittest.mock as mock

    with mock.patch.object(runner_mod, "ROLLUP_GROUPS_PER_FILE", 8):
        m = Migrator(spark, cfg, trk)
        m.run_until_drained()  # seq 1 recompute seeds the table

        # steady state: localized batch through the pruned path
        _enqueue(spark, src, [(3, 3, "UPDATE"), (4, 4, "UPDATE")])
        reads = []
        orig_table = ParquetSource.table

        def spy(self, spk, name):
            reads.append(name)
            return orig_table(self, spk, name)

        with mock.patch.object(ParquetSource, "table", spy):
            m.run_until_drained()
    assert "customer__rollup_by_cust" not in reads, reads


def test_footer_stats_helpers(spark, tmp_path):
    ps = ParquetSource(str(tmp_path))
    df = spark.range(100).withColumn("_seq", F.lit(7))
    ps.write(df, "t")
    assert ps.footer_num_rows("t") == 100
    mx, ok = ps.footer_column_max("t", "_seq")
    assert ok and mx == 7
    _, ok = ps.footer_column_max("t", "nope")
    assert not ok
    ps.write(spark.range(0).withColumn("_seq", F.lit(1)), "empty")
    assert ps.footer_num_rows("empty") == 0
    mx, ok = ps.footer_column_max("empty", "_seq")
    assert ok and mx is None


def test_footer_column_max_refuses_string_columns(spark, tmp_path):
    """ADVICE r12 #4: parquet writers may store TRUNCATED min/max for
    string/binary columns — valid as pruning bounds, wrong as the max
    VALUE — so footer_column_max must report stats_ok=False for any
    column outside the exact-stats physical types (integer/temporal),
    forcing the caller's real-scan fallback."""
    ps = ParquetSource(str(tmp_path))
    df = spark.range(10).select(
        F.col("id"),
        F.concat(F.lit("val-"), F.col("id").cast("string")).alias("s"),
        F.col("id").cast("double").alias("d"),
        (F.lit("2024-01-01").cast("date")).alias("day"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    # timestamps as INT64 micros (the modern layout; Spark's legacy
    # INT96 default carries no row-group stats at all, so it takes the
    # stats-missing fallback arm regardless of this guard)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        ps.write(df, "t")
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    _, ok = ps.footer_column_max("t", "s")
    assert not ok  # BYTE_ARRAY: truncation-capable, refused
    _, ok = ps.footer_column_max("t", "d")
    assert not ok  # DOUBLE: NaN-ordering hazards, refused
    mx, ok = ps.footer_column_max("t", "id")
    assert ok and mx == 9  # INT64: exact
    # temporal columns store as INT32/INT64 physical — still exact
    for c in ("day", "ts"):
        _, ok = ps.footer_column_max("t", c)
        assert ok, c


def test_full_rewrite_apply_preserves_clustering(spark, sf_dir, tmp_path):
    """ADVICE r11 #3: after a SPREAD batch forces the full-rewrite
    apply (touched fraction above ROLLUP_PRUNE_MAX_TOUCHED), the table
    must come out range-clustered again, so the NEXT localized batch
    still file-prunes (keep- hardlinks appear)."""
    from unittest import mock

    from migrator_spark.pipeline import runner as runner_mod

    src, tgt, trk = _mini_src_tgt(spark, sf_dir, tmp_path)
    _enqueue(spark, src, [(1, 1, "UPDATE"), (2, 2, "UPDATE")])
    cfg = _mini_cfg(src, tgt)
    cfg.migrations[0].iterations[0].rollups = [
        {"name": "by_cust", "group_by": ["c_custkey"], "sum": "c_acctbal"}
    ]
    with mock.patch.object(runner_mod, "ROLLUP_GROUPS_PER_FILE", 8):
        m = Migrator(spark, cfg, trk)
        m.run_until_drained()  # seed: 40 groups / 8 per file = 5 files

        # spread batch: 4 keys across the whole range > 5% of 40 groups
        _enqueue(
            spark,
            src,
            [(5, 3, "UPDATE"), (15, 4, "UPDATE"), (25, 5, "UPDATE"), (35, 6, "UPDATE")],
        )
        m.run_until_drained()

        def _files():
            cur = ParquetSource(tgt)._current_dir("customer__rollup_by_cust")
            return sorted(f for f in os.listdir(cur) if f.endswith(".parquet"))

        after_spread = _files()
        # full rewrite happened (no keep- hardlinks)...
        assert not [f for f in after_spread if f.startswith("keep-")]
        # ...but the table is still multi-file range-clustered
        assert len(after_spread) >= 4, after_spread

        # localized follow-up batch prunes again
        _enqueue(spark, src, [(3, 7, "UPDATE"), (4, 8, "UPDATE")])
        m.run_until_drained()
        after_local = _files()
        kept = [f for f in after_local if f.startswith("keep-")]
        assert kept, after_local
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
                "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("v")
            ),
            ["c_custkey"],
            "v",
        ).collect()
    )
    assert got == want


def test_dynamic_routing_to_claimed_rollup_target_rejected(
    spark, sf_dir, tmp_path
):
    """The single-sequencer invariant's RUNTIME arm: two iterations
    whose CONFIGURED targets differ (so the bind-time check passes)
    but whose renaming transformers route into one shared table must
    fail loudly at the second iteration's first maintenance touch —
    before any staged state is written — because two live sequencers
    overwrite each other's write-ahead state (a crashed writer's
    staged delta clobbered by the other is silent, permanent rollup
    divergence)."""
    from migrator_spark.pipeline.config import (
        IterationSpec,
        MigrationSpec,
        MigratorConfig,
        Parameters,
    )
    from migrator_spark.tables import load_table

    src_dir, tgt_dir, trk = f"{tmp_path}/a", f"{tmp_path}/b", f"{tmp_path}/trk"
    customer = (
        load_table(spark, sf_dir, "customer").orderBy("c_custkey").limit(20)
    )
    ps = ParquetSource(src_dir)
    # two distinct source tables feeding the same physical rows
    ps.write(customer, "cust_x")
    ps.write(customer, "cust_y")
    ParquetSource(tgt_dir).write(customer, "shared")

    def it(src_table, tgt_table):
        return IterationSpec(
            source_table=src_table,
            source_key="c_custkey",
            target_table=tgt_table,
            merge_key="c_custkey",
            extractor="queue",
            transformer="tablerenamer",
            transformer_parameters={"TableName": "shared"},
            rollups=[dict(ROLLUP)],
        )

    cfg = MigratorConfig(
        migrations=[
            MigrationSpec(
                source_dsn=src_dir,
                target_dsn=tgt_dir,
                # configured targets DIFFER -> bind-time check passes
                iterations=[it("cust_x", "tx"), it("cust_y", "ty")],
            )
        ],
        parameters=Parameters(batch_size=4),
    )
    from datetime import datetime, timedelta

    rows = [
        ("a", t, "c_custkey", str(k), datetime(2024, 1, 1) + timedelta(seconds=s), "UPDATE")
        for t, k, s in [("cust_x", 1, 1), ("cust_x", 2, 2), ("cust_y", 3, 3), ("cust_y", 4, 4)]
    ]
    ps.write(
        spark.createDataFrame(
            rows,
            "sourceDatabase string, sourceTable string, pkColumn string, "
            "pkValue string, timestampUpdated timestamp, method string",
        ),
        "MigratorRecordQueue",
    )
    errors = []
    m = Migrator(spark, cfg, trk, error_callback=lambda s, e, c: errors.append(e))
    m.run_until_drained()
    # the first iteration claimed 'shared'; the second's touch raised
    assert errors and "already maintained" in str(errors[0]), errors


def test_footer_stats_fallback_without_statistics(spark, tmp_path):
    """footer_column_max must report stats_ok=False when any non-empty
    file lacks column statistics, and _rollup_seq must then fall back
    to the real scan — footer reading is an optimization, never a
    correctness dependency."""
    import types

    import pyarrow as pa
    import pyarrow.parquet as pq

    ps = ParquetSource(str(tmp_path))
    ps.write(spark.range(10).withColumn("_seq", F.lit(3)), "t")
    cur = ps._current_dir("t")
    pq.write_table(
        pa.table({"id": pa.array([100], pa.int64()),
                  "_seq": pa.array([9], pa.int64())}),
        os.path.join(cur, "nostats.parquet"),
        write_statistics=False,
    )
    mx, ok = ps.footer_column_max("t", "_seq")
    assert not ok
    # row counts come from footer metadata regardless of stats
    assert ps.footer_num_rows("t") == 11
    # the seq read falls back to a Spark scan and sees the stats-less
    # file's higher value
    stub = types.SimpleNamespace(spark=spark)
    assert Migrator._rollup_seq(stub, ps, "t") == 9
