"""Property tests: salted operators are semantically transparent —
salted_agg == plain groupBy.agg and salted_join == plain join on any
input (hot keys, empty frames, nulls in value columns)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from migrator_spark.operators.skew import salted_agg, salted_join

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),       # key: tiny domain = hot keys
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    min_size=0,
    max_size=30,
)
DIM = st.dictionaries(
    st.integers(min_value=0, max_value=3), st.text("ab", min_size=1, max_size=3), max_size=4
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(rows=ROWS)
def test_salted_agg_equals_plain(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k long, v long") if rows else spark.createDataFrame(
        [], "k long, v long"
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count("v").alias("c"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.avg("v").alias("a"),
    )
    salted = salted_agg(
        df,
        ["k"],
        [("v", "sum", "s"), ("v", "count", "c"), ("v", "min", "mn"),
         ("v", "max", "mx"), ("v", "avg", "a")],
        n=4,
    )
    key = lambda r: (r["k"],)
    assert sorted(map(repr, (tuple(r) for r in salted.collect()))) == sorted(
        map(repr, (tuple(r) for r in plain.collect()))
    )


@SETTINGS
@given(rows=ROWS, dim=DIM)
def test_salted_join_equals_plain(spark, rows, dim):
    big = spark.createDataFrame(rows, "k long, v long") if rows else spark.createDataFrame(
        [], "k long, v long"
    )
    small = (
        spark.createDataFrame(sorted(dim.items()), "k long, name string")
        if dim
        else spark.createDataFrame([], "k long, name string")
    )
    for how in ("inner", "left"):
        plain = big.join(small, ["k"], how)
        salted = salted_join(big, small, ["k"], n=3, how=how)
        assert sorted(map(repr, (tuple(r) for r in salted.collect()))) == sorted(
            map(repr, (tuple(r) for r in plain.collect()))
        ), how
