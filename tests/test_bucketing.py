"""Bucketed co-located joins: prove the shuffle disappears.

The scale claim in SCALE.md §5 is that bucketing both fact tables on
the join key eliminates both Exchanges from the sort-merge join. This
test asserts it on the executed plan, not by eyeball.
"""

from __future__ import annotations

import uuid

import pytest

from migrator_spark.operators.bucketing import read_bucketed, write_bucketed
from migrator_spark.tables import load_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def bucketed_pair(spark, sf_dir, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    names = (f"orders_b_{suffix}", f"lineitem_b_{suffix}")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        names[0],
        ["o_orderkey"],
        8,
        str(tmp_path / names[0]),
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        names[1],
        ["l_orderkey"],
        8,
        str(tmp_path / names[1]),
        sort_cols=["l_orderkey"],
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    orders_b, lineitem_b = bucketed_pair
    # force the join down the SMJ path (broadcast would hide bucketing)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, orders_b).join(
            read_bucketed(spark, lineitem_b),
            read_bucketed(spark, orders_b).o_orderkey
            == read_bucketed(spark, lineitem_b).l_orderkey,
        )
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and the result is right
        li_rows = read_bucketed(spark, lineitem_b).count()
        assert joined.count() == li_rows  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet has Exchanges — i.e.
    the previous test's assertion is meaningful."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        plan = _executed_plan(orders.join(li, orders.o_orderkey == li.l_orderkey))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also skips its shuffle."""
    _, lineitem_b = bucketed_pair
    from pyspark.sql import functions as F

    agg = read_bucketed(spark, lineitem_b).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
    assert agg.count() > 0
