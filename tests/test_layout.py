"""Physical layout: partition pruning and range-clustered file skipping.

SCALE.md's layout claims, proven on the plan and on actual file
touch-counts at test scale:

* a filter on a partition column appears under `PartitionFilters` (the
  scan prunes directories at planning time, before reading any footer);
* a range-clustered table concentrates an interval predicate's matches
  into strictly fewer files than the same data hash-scattered — the
  precondition for parquet min/max row-group skipping to pay off.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from migrator_spark.operators.layout import (
    read_partitioned,
    write_partitioned,
    write_range_clustered,
    write_zorder_clustered,
)
from migrator_spark.tables import load_table


def _formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def events_with_day(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )


def test_partitioned_write_prunes_directories(spark, events_with_day, tmp_path):
    path = str(tmp_path / "events_by_day")
    write_partitioned(events_with_day, path, ["day"])

    # one file per directory: the pre-write repartition on the
    # partition column prevents the N-tasks × M-dirs small-file blowup
    days = [d for d in os.listdir(path) if d.startswith("day=")]
    assert len(days) >= 25  # January of synthetic events
    for d in days:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    back = read_partitioned(spark, path)
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = _formatted_plan(one_day)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200], plan
    expected = events_with_day.filter(F.col("day") == "2024-01-05").count()
    assert one_day.count() == expected > 0
    # pruning is physical: only the matching directory's file is read
    touched = {r[0] for r in one_day.select(F.input_file_name()).distinct().collect()}
    assert len(touched) == 1 and "day=2024-01-05" in next(iter(touched))


def test_partitioned_roundtrip_content(spark, events_with_day, tmp_path):
    path = str(tmp_path / "events_rt")
    write_partitioned(events_with_day, path, ["day"], sort_cols=["ts"])
    back = read_partitioned(spark, path)
    assert back.count() == events_with_day.count()
    a = sorted(events_with_day.select("event_id", "day").collect())
    # partition-column type inference parses day=2024-01-05 back as a
    # DATE; normalize to the written string form for the comparison
    b = sorted(
        back.select("event_id", F.date_format("day", "yyyy-MM-dd").alias("day")).collect()
    )
    assert a == b


def test_range_clustering_concentrates_interval_matches(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    n_files = 8
    scattered = str(tmp_path / "ev_scattered")
    clustered = str(tmp_path / "ev_clustered")
    # hash layout: interval rows land everywhere
    ev.repartition(n_files, "event_id").write.mode("overwrite").parquet(scattered)
    write_range_clustered(ev, clustered, ["ts"], n_files)

    lo, hi = "2024-01-10", "2024-01-13"
    pred = (F.col("ts") >= F.lit(lo).cast("timestamp")) & (
        F.col("ts") < F.lit(hi).cast("timestamp")
    )

    def touched(path: str) -> int:
        df = spark.read.parquet(path).filter(pred)
        return df.select(F.input_file_name()).distinct().count()

    n_scattered, n_clustered = touched(scattered), touched(clustered)
    # ~10% of a 30-day range: hash spreads it over every file, range
    # layout pins it to the one or two covering slices
    assert n_scattered == n_files, n_scattered
    assert n_clustered <= 2, n_clustered
    # same rows either way
    assert (
        spark.read.parquet(clustered).filter(pred).count()
        == spark.read.parquet(scattered).filter(pred).count()
        > 0
    )
    # and the timestamp predicate is still pushed to the scan
    plan = _formatted_plan(spark.read.parquet(clustered).filter(pred))
    assert "PushedFilters" in plan and "ts" in plan, plan


def test_zorder_preserves_locality_in_every_dimension(spark, sf_dir, tmp_path):
    """Z-order on (user_id, ts): a 2-D box predicate concentrates into
    few files, AND each single-dimension predicate still skips files —
    the property 1-D range clustering can't give (its secondary
    dimension is scattered across every file)."""
    ev = load_table(spark, sf_dir, "events")
    n_files = 16
    zpath = str(tmp_path / "ev_z")
    hpath = str(tmp_path / "ev_h")
    write_zorder_clustered(ev, zpath, ["user_id", "ts"], n_files)
    ev.repartition(n_files, "event_id").write.mode("overwrite").parquet(hpath)

    ts_pred = (F.col("ts") >= F.lit("2024-01-10").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-13").cast("timestamp")
    )
    user_pred = F.col("user_id").between(3, 5)
    box = user_pred & ts_pred

    def touched(path, pred) -> int:
        df = spark.read.parquet(path).filter(pred)
        return df.select(F.input_file_name()).distinct().count()

    # 2-D box: ~2% of rows -> a couple of z-tiles; hash scatters it
    # across (nearly) every file
    assert touched(zpath, box) <= 4 < touched(hpath, box)
    # each dimension alone retains file-level locality (the MSB-aligned
    # interleave: neither dim's bits are buried under the other's)
    assert touched(zpath, ts_pred) <= n_files // 2
    assert touched(zpath, user_pred) <= 10
    # layout changes bytes read, never results
    assert spark.read.parquet(zpath).filter(box).count() == ev.filter(box).count() > 0
