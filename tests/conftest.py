"""Shared fixtures: one SparkSession per test session, DuckDB with the
driver's view layout, and the differential-compare helper that mirrors
the driver's check (row count + column names + order-insensitive
value compare with column sort by name)."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from migrator_spark.session import get_spark  # noqa: E402
from migrator_spark.tables import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("migrator_spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def ddb(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    try:
        import pandas as pd

        if v is None or v is pd.NaT or (pd.isna(v) is True):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return v


def assert_frames_match(spark_df, duck_rel, check_exact_floats=True):
    """Order-insensitive comparison, columns sorted by name — the same
    contract the driver's CORRECTNESS check uses."""
    sp = spark_df.toPandas()
    dp = duck_rel.df()
    assert sorted(sp.columns) == sorted(dp.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duck={sorted(dp.columns)}"
    )
    cols = sorted(sp.columns)
    sp = sp[cols]
    dp = dp[cols]
    assert len(sp) == len(dp), f"row count mismatch: spark={len(sp)} duck={len(dp)}"
    sp_rows = sorted([tuple(_norm_cell(v) for v in row) for row in sp.itertuples(index=False)], key=repr)
    dp_rows = sorted([tuple(_norm_cell(v) for v in row) for row in dp.itertuples(index=False)], key=repr)
    mismatches = []
    for i, (a, b) in enumerate(zip(sp_rows, dp_rows)):
        for c, (x, y) in enumerate(zip(a, b)):
            ok = x == y
            if not ok and isinstance(x, float) and isinstance(y, float):
                if check_exact_floats:
                    ok = x == y or (math.isnan(x) and math.isnan(y))
                else:
                    ok = math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
            if not ok:
                mismatches.append((i, cols[c], x, y))
                if len(mismatches) > 5:
                    break
        if len(mismatches) > 5:
            break
    assert not mismatches, f"value mismatches (row, col, spark, duck): {mismatches}"
    if check_exact_floats:
        # the driver's hash is repr-strict: 4420 (int64) vs 4420.0 (a
        # DuckDB HUGEINT sum decayed to float) passes == above but fails
        # the driver — mirror that strictness here so pytest catches it
        sp_repr = sorted(map(repr, sp.itertuples(index=False, name=None)))
        dp_repr = sorted(map(repr, dp.itertuples(index=False, name=None)))
        diff = [(a, b) for a, b in zip(sp_repr, dp_repr) if a != b][:3]
        assert sp_repr == dp_repr, f"strict repr mismatch (driver-style): {diff}"
