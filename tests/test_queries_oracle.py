"""Differential correctness: every registry query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (row-count + columns +
order-insensitive values at sf0.01); tests run at sf0.001 for speed —
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run at driver SF.
"""

from __future__ import annotations

import pytest

from migrator_spark.plans.registry import REGISTRY

from .conftest import assert_frames_match

ORACLE_CASES = [(name, spec) for name, spec in REGISTRY.items() if spec.oracle is not None]
NO_ORACLE_CASES = [(name, spec) for name, spec in REGISTRY.items() if spec.oracle is None]


@pytest.mark.parametrize("name,spec", ORACLE_CASES, ids=[n for n, _ in ORACLE_CASES])
def test_query_matches_oracle(spark, ddb, sf_dir, name, spec):
    sdf = spec.fn(spark, sf_dir)
    rel = ddb.sql(spec.oracle)
    assert_frames_match(sdf, rel)


@pytest.mark.parametrize("name,spec", NO_ORACLE_CASES, ids=[n for n, _ in NO_ORACLE_CASES])
def test_query_runs(spark, sf_dir, name, spec):
    sdf = spec.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    ks = set(e.queries())
    assert set(e.oracle_sql()) <= ks
