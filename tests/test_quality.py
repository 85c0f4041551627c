"""Constraint-audit units: every check counts its violations correctly
on crafted data (dq1's oracle covers the real tables; here the nonzero
paths for unique/fk/not_null that happen to be clean in the corpus)."""

from __future__ import annotations

from migrator_spark.operators import quality as dq


def _report(checks) -> dict[str, int]:
    return {r["constraint"]: r["n_violations"] for r in dq.audit(checks).collect()}


def test_each_check_counts_violations(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, "x"), (9, "a")],
        "k long, v string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = _report(
        [
            dq.unique_key(child, ["k"]),  # k=1 twice -> 1 surplus row
            dq.foreign_key(child, "k", parent, "k"),  # k=9 orphaned
            dq.not_null(child, "v"),  # one NULL
            dq.accepted_values(child, "v", ["a", "x"]),  # NULL not counted
            dq.in_range(child, "k", 1, 3),  # k=9 outside
        ]
    )
    assert got == {
        "unique(k)": 1,
        "fk(k)": 1,
        "not_null(v)": 1,
        "accepted(v)": 0,
        "range(k)": 1,
    }


def test_empty_table_is_clean(spark):
    empty = spark.createDataFrame([], "k long, v string")
    got = _report([dq.unique_key(empty, ["k"]), dq.not_null(empty, "v")])
    assert got == {"unique(k)": 0, "not_null(v)": 0}
