"""Round 13 (optimization): the extractor's static CDC-method bound.

Every extractor lit-tags whole arms with one method, so the set of
methods a batch CAN contain is known without a job. ExtractResult now
carries that bound, the runner forwards it on pass-through frames, and
the loaders consult it instead of running a per-batch
``select(_method).distinct().collect()`` — one Spark job per E->T->L
cycle whose only purpose was answering "is this batch entirely
INSERT?". These tests pin:

* the loader helper trusts a forwarded bound WITHOUT running any job;
* the runner forwards the bound only to frames the transformer passed
  through untouched (a derived frame must re-probe — a user transform
  may rewrite ``_method``);
* hinted and probed paths pick identical loader branches (same final
  table, same append-vs-rewrite behavior).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from migrator_spark.pipeline import registries
from migrator_spark.pipeline.loaders import _method_bound
from migrator_spark.pipeline.runner import Migrator
from migrator_spark.sources.parquet import ParquetSource
from tests.test_pipeline import Q_SCHEMA, X_ROWS, X_SCHEMA, _mk_config


def test_method_bound_trusts_hint_without_a_job(spark):
    df = spark.createDataFrame([(1, "INSERT")], "id long, _method string")
    df._mig_method_bound = frozenset({"INSERT"})

    def boom(*a, **k):  # any Spark access means the hint was ignored
        raise AssertionError("hinted batch must not be probed")

    df.select = boom
    assert _method_bound(df) == {"INSERT"}


def test_method_bound_falls_back_to_distinct_probe(spark):
    df = spark.createDataFrame(
        [(1, "REPLACE"), (2, "REMOVE"), (3, "REPLACE")],
        "id long, _method string",
    )
    assert _method_bound(df) == {"REPLACE", "REMOVE"}


@pytest.fixture
def seeded(spark, tmp_path):
    src_dir, tgt_dir, trk = (
        str(tmp_path / "a"),
        str(tmp_path / "b"),
        str(tmp_path / "trk"),
    )
    src = ParquetSource(src_dir)
    src.write(spark.createDataFrame(X_ROWS, X_SCHEMA), "x")
    return src_dir, tgt_dir, trk


def _spy_loader(seen):
    orig = registries.LOADERS["default"]

    def spy(spark_, target, table, batch, it, params):
        seen.append(frozenset(b) if (b := getattr(batch, "_mig_method_bound", None)) is not None else None)
        return orig(spark_, target, table, batch, it, params)

    return orig, spy


def test_runner_forwards_bound_on_passthrough(spark, seeded):
    src_dir, tgt_dir, trk = seeded
    seen = []
    orig, spy = _spy_loader(seen)
    registries.LOADERS["default"] = spy
    try:
        cfg = _mk_config(src_dir, tgt_dir, batch_size=2)
        Migrator(spark, cfg, trk).run_until_drained()
    finally:
        registries.LOADERS["default"] = orig
    assert seen and all(b == frozenset({"INSERT"}) for b in seen)
    got = sorted(
        ParquetSource(tgt_dir).table(spark, "x").collect(),
        key=lambda r: r["id"],
    )
    assert [r["id"] for r in got] == [1, 2, 3, 4]


def test_runner_drops_bound_on_derived_frames(spark, seeded):
    src_dir, tgt_dir, trk = seeded
    seen = []
    orig, spy = _spy_loader(seen)
    registries.LOADERS["default"] = spy
    try:
        cfg = _mk_config(
            src_dir,
            tgt_dir,
            transformer="python",
            transformer_parameters={
                # a derived frame: same rows, new DataFrame object
                "callable": "tests.test_round13_method_bound._identity_filter"
            },
            batch_size=10,
        )
        Migrator(spark, cfg, trk).run_until_drained()
    finally:
        registries.LOADERS["default"] = orig
    assert seen and all(b is None for b in seen)
    got = ParquetSource(tgt_dir).table(spark, "x")
    assert got.count() == 4


def _identity_filter(batch, ctx):
    return batch.filter("id >= 0")


def test_queue_bound_keeps_merge_semantics(spark, seeded):
    """A queue drain (bound = {REPLACE, REMOVE}) lands the same final
    table as the method-probe path always did: UPDATE applies the live
    source row, REMOVE deletes, and the bound never routes a mixed
    batch to the append fast path."""
    src_dir, tgt_dir, trk = seeded
    src = ParquetSource(src_dir)
    tgt = ParquetSource(tgt_dir)
    tgt.write(spark.createDataFrame(X_ROWS, X_SCHEMA), "x")
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    queue = [
        ("a", "x", "id", "2", t0, "UPDATE"),
        ("a", "x", "id", "3", datetime(2024, 1, 1, 0, 0, 1), "REMOVE"),
    ]
    src.write(spark.createDataFrame(queue, Q_SCHEMA), "MigratorRecordQueue")
    cfg = _mk_config(
        src_dir, tgt_dir, extractor="queue", merge_key="id", batch_size=10
    )
    Migrator(spark, cfg, trk).run_until_drained()
    got = {r["id"] for r in tgt.table(spark, "x").collect()}
    assert got == {1, 2, 4}
