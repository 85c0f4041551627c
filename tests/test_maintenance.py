"""Maintenance operators: compaction and incremental rollup upkeep.

The rollup property: patching the aggregate with the batch delta must
equal recomputing it from the merged fact table — for any interleaving
of INSERT/REPLACE/REMOVE, including groups that empty out entirely.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from migrator_spark.operators import load as ld
from migrator_spark.operators.extract import M_REMOVE, M_REPLACE, METHOD_COL
from migrator_spark.operators.maintenance import (
    compact_table,
    compute_rollup,
    maintain_rollup,
)
from migrator_spark.sources.parquet import ParquetSource

KEYS = st.integers(min_value=0, max_value=7)
VALS = st.integers(min_value=-100, max_value=100)
EVENTS = st.lists(
    st.tuples(KEYS, VALS, st.sampled_from([M_REPLACE, M_REMOVE, "INSERT"])),
    min_size=0,
    max_size=16,
)
TARGETS = st.dictionaries(KEYS, VALS, max_size=8)

EVENT_SCHEMA = f"k long, g long, v long, {METHOD_COL} string, seq long, tie string"
TARGET_SCHEMA = "k long, g long, v long"

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _g(k: int):
    # group col derived from key -> group membership moves with upserts.
    # One residue class maps to NULL: groupBy treats NULL as a real
    # group, and the round-11 null-safe patch join must too (a plain
    # equi-join SPLITS the NULL group into stale + delta-only rows).
    return k % 3 if k % 3 != 2 else None


def _target_df(spark, target):
    return spark.createDataFrame(
        [(k, _g(k), v) for k, v in sorted(target.items())], TARGET_SCHEMA
    )


def _rollup_rows(df):
    return sorted(
        ((r["g"], r["sum_val"], r["n_rows"]) for r in df.collect()),
        key=lambda t: ((t[0] is None, t[0]), t[1], t[2]),
    )


@SETTINGS
@given(target=TARGETS, events=EVENTS)
def test_rollup_patch_equals_recompute(spark, target, events):
    tgt = _target_df(spark, target)
    rollup = compute_rollup(tgt, ["g"], "v")
    batch = spark.createDataFrame(
        [(k, _g(k), v, m, i, str(i)) for i, (k, v, m) in enumerate(events)],
        EVENT_SCHEMA,
    )
    final = ld.latest_by_key(batch, ["k"], "seq", "tie")
    patched = maintain_rollup(rollup, tgt, final, ["k"], ["g"], "v")
    merged = ld.apply_cdc_batch(tgt, batch, ["k"], "seq", "tie")
    assert _rollup_rows(patched) == _rollup_rows(compute_rollup(merged, ["g"], "v"))


def test_compact_small_files(spark, tmp_path):
    src = ParquetSource(str(tmp_path))
    base = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    src.write(base.repartition(4), "t")
    # simulate 12 CDC appends -> dozens of tiny part-files
    for i in range(12):
        src.write(
            spark.range(1000 + i * 10, 1010 + i * 10).selectExpr("id", "id * 2 AS v"),
            "t",
            mode="append",
        )
    before_cnt = src.table(spark, "t").count()
    files_before, files_after = compact_table(
        spark, src, "t", target_file_bytes=1 << 30, min_files=1
    )
    assert files_before > 12
    assert files_after < files_before
    assert files_after <= 2
    after = src.table(spark, "t")
    assert after.count() == before_cnt
    assert after.selectExpr("sum(v)").first()[0] == base.unionByName(
        spark.range(1000, 1120).selectExpr("id", "id * 2 AS v")
    ).selectExpr("sum(v)").first()[0]


def test_compact_noop_when_already_compact(spark, tmp_path):
    src = ParquetSource(str(tmp_path))
    src.write(spark.range(100).coalesce(1), "t")
    files_before, files_after = compact_table(spark, src, "t", min_files=1)
    assert files_before == files_after


def _minmax_rows(df, vcol):
    return sorted(
        ((r["g"], r[vcol], r["n_rows"]) for r in df.collect()),
        key=lambda t: ((t[0] is None, t[0]), (t[1] is None, t[1]), t[2]),
    )


@SETTINGS
@given(
    target=TARGETS,
    events=EVENTS,
    extra_groups=st.lists(st.sampled_from([0, 1, None]), max_size=3),
    agg=st.sampled_from(["min", "max"]),
)
def test_minmax_scoped_recompute_equals_full(
    spark, target, events, extra_groups, agg
):
    """The min/max arm's algebra (round 12, VERDICT r11 #5): replacing
    the staged groups' rollup rows with a SCOPED recompute from the
    post-merge target equals the full recompute — for any interleaving
    of INSERT/REPLACE/REMOVE (including retraction of a group's
    current extremum and groups emptying out), for the NULL group, and
    for any SUPERSET of the truly touched groups (the property that
    makes crash-replay staged-set unions safe)."""
    import pyspark.sql.functions as F

    from migrator_spark.operators.maintenance import scoped_minmax_recompute

    aggfn = F.min if agg == "min" else F.max
    vcol = f"{agg}_val"

    def mm_rollup(df):
        return df.groupBy("g").agg(
            aggfn(F.col("v").cast("decimal(18,2)")).alias(vcol),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )

    tgt = _target_df(spark, target)
    rollup_before = mm_rollup(tgt)
    batch = spark.createDataFrame(
        [(k, _g(k), v, m, i, str(i)) for i, (k, v, m) in enumerate(events)],
        EVENT_SCHEMA,
    )
    final = ld.latest_by_key(batch, ["k"], "seq", "tie")
    merged = ld.apply_cdc_batch(tgt, batch, ["k"], "seq", "tie")

    # the runner's staged set: old groups of the batch's keys ∪ the
    # non-REMOVE rows' groups — plus arbitrary extra groups (replay
    # unions must stay correct for any superset)
    keys = final.select("k").dropDuplicates(["k"])
    old_groups = tgt.join(keys, on=["k"], how="left_semi").select("g")
    new_groups = final.filter(F.col(METHOD_COL) != M_REMOVE).select("g")
    groups = old_groups.unionByName(new_groups)
    if extra_groups:
        groups = groups.unionByName(
            spark.createDataFrame([(g,) for g in extra_groups], "g long")
        )
    groups = groups.dropDuplicates(["g"])
    leads = [r[0] for r in groups.collect()]

    scoped = scoped_minmax_recompute(merged, groups, ["g"], "v", agg, leads)
    r, gb = rollup_before.alias("r"), F.broadcast(groups).alias("g")
    survivors = r.join(
        gb, F.col("r.g").eqNullSafe(F.col("g.g")), "left_anti"
    ).select("g", vcol, "n_rows")
    patched = survivors.unionByName(scoped.select("g", vcol, "n_rows"))

    assert _minmax_rows(patched, vcol) == _minmax_rows(mm_rollup(merged), vcol)
