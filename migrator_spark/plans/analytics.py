"""Extended analytics suite over the synthetic star schema.

Widens the relational surface beyond plans/tpch.py: semi-joins (q4),
scan-only pushdown aggregates (q6), grouped top-k over 4-way joins
(q10), conditional aggregation (q14), aggregate-then-join with a HAVING
filter (q18), window ranking (q2-style), multi-dim pair grouping (q7),
and exact data profiling (pr1). The reference exposes none of these —
its relational content is the fixed SQL its extractors emit
(/root/reference/extractor_sequential.go:39, SURVEY.md §2.2) — but an
engine claiming "same query capabilities, Spark-first" must subsume
them, and each is oracle-checked against DuckDB.

Float discipline follows plans/tpch.py: money math in DECIMAL(18,2)
(exact, order-independent across partitions/engines), cast to double
only at the edge.

Scale notes (100 TB):
* q4  — semi-join keeps only orders columns; lineitem is never
  materialized past the join. Shuffles on orderkey, the natural
  co-partitioning key for both facts (bucketing both tables by
  orderkey makes it shuffle-free).
* q6  — pure scan+filter+agg: predicate pushdown to parquet row-group
  min/max skipping; single-row result, no shuffle beyond partials.
* q10 — one fact-fact shuffle join (orders⋈lineitem on orderkey);
  customer/nation broadcast. Top-20 via TakeOrderedAndProject: no
  global sort materialization.
* q14 — part is a dimension: broadcast; lineitem never shuffles.
* q18 — the qty rollup shuffles lineitem by orderkey once; the
  HAVING filter (>300) cuts the join input by ~1000× before the
  orders join, so the second shuffle moves almost nothing.
* q2w — window over supplier (a dim table): partitions by nation,
  tiny state; never touches facts.
* q7  — both nation sides broadcast; the only shuffle is the final
  625-group agg of pre-reduced partials.
* pr1 — exact count-distinct shuffles only distinct custkeys
  (map-side partial dedup first); all other metrics are partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migrator_spark.tables import load_table

DEC = "decimal(18,2)"


def _revenue():
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: priority distribution of 1996 orders having at
    least one line shipped after the order date (EXISTS → left-semi join;
    the synthetic schema lacks commit/receipt dates)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: revenue delta from discount changes — the
    canonical pushdown showcase (all three predicates reach the parquet
    scan; .explain shows PushedFilters on l_shipdate/l_discount/
    l_quantity)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").cast(DEC) >= F.lit("0.03").cast(DEC))
            & (F.col("l_discount").cast(DEC) <= F.lit("0.07").cast(DEC))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
            .cast("double")
            .alias("revenue")
        )
    )


Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST('0.03' AS DECIMAL(18,2)) AND CAST('0.07' AS DECIMAL(18,2))
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: top 20 customers by revenue lost to returns
    (l_returnflag = 'R') for orders placed in 1996H2."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_ORACLE = """
SELECT
  c_custkey, c_name, c_acctbal, n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue: share of 1996-01 revenue from PROMO parts —
    conditional aggregation over a broadcast part⋈lineitem join."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


Q14_ORACLE = """
SELECT
  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-02-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: large-volume orders (total quantity > 300) —
    aggregate-then-join: the HAVING filter runs before the orders join so
    the second shuffle carries only qualifying keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"))
        .filter(F.col("_sq") > F.lit(300).cast(DEC))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(300 AS DECIMAL(18,2))
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q2w_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: highest-balance supplier per nation via window
    ranking (row_number over partitionBy nation) — dims only, no facts."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return (
        supp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name", "s_name", "s_acctbal")
        .orderBy("n_name")
    )


Q2W_ORACLE = """
SELECT r_name, n_name, s_name, s_acctbal
FROM (
  SELECT *, row_number() OVER (PARTITION BY s_nationkey
                               ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
  FROM supplier
) s
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE rn = 1
ORDER BY n_name
"""


def q7_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue: 1996 revenue by (supplier nation, customer
    nation) pair — two independent broadcast dimension paths onto the
    same fact row."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp_nation = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_nation = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_nation), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation")
    )


Q7_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier      ON l_suppkey = s_suppkey
JOIN nation sn     ON s_nationkey = sn.n_nationkey
JOIN orders        ON l_orderkey = o_orderkey
JOIN customer      ON o_custkey = c_custkey
JOIN nation cn     ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY sn.n_name, cn.n_name
ORDER BY supp_nation, cust_nation
"""


def pr1_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact table profiling (the data-quality pass a training pipeline
    runs before ingest): row count, key cardinality, date bounds, exact
    decimal average, null counts."""
    orders = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    return orders.agg(
        n.alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / n).alias("avg_price"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_priorities"),
    )


PR1_ORACLE = """
SELECT
  count(*) AS n_rows,
  count(DISTINCT o_custkey) AS n_customers,
  count(DISTINCT o_orderstatus) AS n_statuses,
  min(o_orderdate) AS first_order,
  max(o_orderdate) AS last_order,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_priorities
FROM orders
"""


# --------------------------------------------------------------- skew ops


def sk1_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over events (user_id has a ~15-value
    hot key domain: exactly the shape that starves reducers at scale).
    Result is identical to the plain groupBy — the oracle is the plain
    GROUP BY."""
    from migrator_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast(DEC)
    )
    out = salted_agg(
        ev,
        keys=["user_id"],
        aggs=[
            ("event_id", "count", "n_events"),
            ("value_dec", "sum", "sum_value_dec"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
        ],
        n=16,
    )
    return out.select(
        "user_id",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("user_id")


SK1_ORACLE = """
SELECT user_id,
       count(event_id) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def sk2_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join: events (big, skewed on user_id) ⋈ customer
    (small side replicated across 8 salts), then revenue by market
    segment. Same result as the unsalted join."""
    from migrator_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on=["user_id"], n=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


SK2_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ----------------------------------------------------- time-series / sets


def ev1_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics via lag() — the sequential
    window shape (lag/lead over event time) that session analysis and
    anomaly detection start from. Gap math in exact epoch-micros
    (unix_micros / epoch_us) so both engines agree bit-for-bit.

    Scale: partitions by user_id — the window state is one previous row
    per user per partition; no global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    gaps = ev.select("user_id", gap.alias("gap_us")).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("avg_gap_us"),
        )
        .orderBy("user_id")
    )


EV1_ORACLE = """
SELECT user_id,
       count(*) AS n_gaps,
       min(gap_us) AS min_gap_us,
       max(gap_us) AS max_gap_us,
       CAST(sum(gap_us) AS DOUBLE) / count(*) AS avg_gap_us
FROM (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts ASC, event_id ASC) AS gap_us
  FROM events
)
WHERE gap_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


def set1_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra (§2.7 'none in the reference' — subsumed here):
    customers ordering in both 1996 AND 1997 (INTERSECT) but not in
    1995 (EXCEPT)."""
    orders = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return (
        year(1996).intersect(year(1997)).subtract(year(1995)).orderBy("o_custkey")
    )


SET1_ORACLE = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
ORDER BY o_custkey
"""


def q8_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage (SURVEY.md §2.4 notes the reference has
    none): ROLLUP over (l_returnflag, l_linestatus) with GROUPING() to
    disambiguate subtotal rows from genuine NULL groups. Map-side
    partials expand per grouping set; the shuffle still carries only
    |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_price"),
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


Q8_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate: revenue from lineitems
    matching either of two (brand, size, quantity) branches — exercises
    OR-of-ANDs pushdown and join-then-filter planning. part broadcasts;
    the OR collapses to a single scan pass."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 20)
        & (F.col("l_quantity") <= 20)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size") >= 10)
        & (F.col("l_quantity") >= 30)
    )
    return joined.filter(branch1 | branch2).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_revenue()).cast("double").alias("revenue"),
    )


Q19_ORACLE = """
SELECT count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 20 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size >= 10 AND l_quantity >= 30)
"""


def f2_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured (JSON) column handling: extract a typed value
    from the events.props JSON payload and aggregate per event type —
    get_json_object is JVM-side (Jackson), no Python; at scale the
    extraction runs in the scan's codegen stage before the small
    groupBy shuffle."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


F2_ORACLE = """
SELECT event_type,
       count(k) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, json_extract_string(props, '$.k')::BIGINT AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def f3_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family: extract + truncate + diff — orders per
    (year, quarter) with first/last day and span in days."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderdate").alias("first_ts"),
            F.max("o_orderdate").alias("last_ts"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
            .cast("long")
            .alias("span_days"),
        )
        .orderBy("yr", "qtr")
    )


F3_ORACLE = """
SELECT year(o_orderdate) AS yr,
       quarter(o_orderdate) AS qtr,
       count(*) AS n_orders,
       min(o_orderdate) AS first_ts,
       max(o_orderdate) AS last_ts,
       CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS span_days
FROM orders
GROUP BY year(o_orderdate), quarter(o_orderdate)
ORDER BY yr, qtr
"""


def f4_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over customer names: case mapping,
    substring, padding, replace, concatenation, length — one projecting
    pass, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(name).alias("up"),
        F.lower(name).alias("lo"),
        F.substring(name, 1, 8).alias("first8"),
        F.length(name).cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_replace(name, "[0-9]+", "#").alias("digits_masked"),
        F.concat_ws("|", name, F.col("c_mktsegment")).alias("tagged"),
    ).orderBy("c_custkey")


F4_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS up,
       lower(c_name) AS lo,
       substr(c_name, 1, 8) AS first8,
       CAST(length(c_name) AS BIGINT) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS digits_masked,
       concat_ws('|', c_name, c_mktsegment) AS tagged
FROM customer
ORDER BY c_custkey
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue: distribution of customers by order count,
    including zero-order customers — the canonical LEFT OUTER JOIN +
    double aggregation shape the suite otherwise lacks. The priority
    filter stands in for Q13's o_comment NOT LIKE (no comment column in
    the synthetic schema) and must live in the join condition, not a
    WHERE, to keep customers with only-excluded orders at count 0.

    Scale: shuffles on custkey once (orders pre-filtered map-side); the
    second aggregation groups a ~|customers| input down to tens of rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: supplier(s) achieving the maximum quarterly
    revenue — scalar-subquery-against-aggregate shape. Revenue stays
    DECIMAL end-to-end so the max-equality join cannot drift between
    engines (double equality would).

    Scale: lineitem reduces to one row per suppkey before anything
    joins; the 1-row max and the supplier dim broadcast, so the only
    shuffle is the suppkey rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("_tr"))
    )
    maxr = rev.agg(F.max("_tr").alias("_mr"))
    return (
        rev.join(F.broadcast(maxr), F.col("_tr") == F.col("_mr"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_tr").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS tr
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE tr = (SELECT max(tr) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue: yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) moved to bulk. The
    correlated AVG subquery is decorrelated into a per-partkey rollup
    joined back to lineitem. `qty < 0.2*avg(qty)` is evaluated as
    `5*qty*cnt < sum_qty` in exact DECIMAL — multiply-through instead of
    decimal division, so no engine-specific rounding can flip a
    borderline row.

    Scale: both the rollup and the probe shuffle on l_partkey — one
    co-partitioned key; the part dim filter broadcasts. At 100 TB the
    rollup output is |parts|-sized, far below the probe side, and AQE
    turns the back-join into a broadcast when the brand filter is
    selective.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity").cast(DEC)
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("_sq"), F.count(F.lit(1)).cast(DEC).alias("_cnt")
    )
    brand = part.filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    ).select("p_partkey")
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, on="l_partkey")
        .filter(F.lit(5).cast(DEC) * qty * F.col("_cnt") < F.col("_sq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         CAST(count(*) AS DECIMAL(18,2)) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23' AND p_size < 15
JOIN per_part USING (l_partkey)
WHERE CAST(5 AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * cnt < sq
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue: per-nation count/balance of customers with
    above-average account balance and no orders in the current year
    (every synthetic customer has *some* order, so the recency bound
    keeps the anti-join selective instead of vacuous) — anti-join plus a
    scalar aggregate threshold. `bal > avg(bal)` over the positive-
    balance population is evaluated as `bal*cnt > sum_bal` in exact
    DECIMAL (same multiply-through trick as q17).

    Scale: the threshold aggregate is one row (broadcast); the
    anti-join needs only o_custkey from orders — column pruning cuts the
    shuffle to one long per order — and groups by nationkey at the end.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast(DEC)
    thresh = cust.filter(bal > F.lit(0).cast(DEC)).agg(
        F.sum(bal).alias("_sb"), F.count(F.lit(1)).cast(DEC).alias("_cb")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(bal * F.col("_cb") > F.col("_sb"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


Q22_ORACLE = """
WITH thresh AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sb,
         CAST(count(*) AS DECIMAL(18,2)) AS cb
  FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0
)
SELECT c_nationkey AS nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, thresh
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cb > sb
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_nationkey
ORDER BY nationkey
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue: profit by supplier nation and order year for
    LIKE-filtered parts. The synthetic schema has no partsupp, so cost
    is proxied as 60% of the part's retail price per unit (stated, not
    TPC-H-exact — the shape under test is the 5-way join + substring
    filter + year extraction, all in exact DECIMAL).

    Scale: part (LIKE-filtered), supplier, and nation broadcast; the
    only shuffles are lineitem⋈orders on orderkey and the final
    (nation, year) rollup of pre-reduced partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    ) - F.lit(0.6).cast(DEC) * F.col("p_retailprice").cast(DEC) * F.col(
        "l_quantity"
    ).cast(DEC)
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(0.6 AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: how many distinct suppliers ship each
    (brand, type, size) combination, excluding a brand and a type set —
    exact COUNT(DISTINCT) per group with NOT-IN exclusion. Supplier
    pairs come from lineitem (no partsupp in the synthetic schema).

    Scale: the distinct collapses (partkey, suppkey) pairs map-side
    before the group shuffle; part broadcasts. Exact distinct is the
    oracle-checkable form — at 100 TB swap to approx_count_distinct
    (HLL) per SCALE.md.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    keep = part.filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").isin("PROMO", "SMALL"))
        & (F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20))
    )
    return (
        li.join(F.broadcast(keep), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type NOT IN ('PROMO', 'SMALL')
  AND p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: suppliers who moved more than 300 units of
    red parts in 1996 — nested semi-join shape (supplier SEMI JOIN a
    HAVING-filtered rollup that itself joins a LIKE-filtered dim). The
    300 threshold selects roughly half the suppliers at test SFs.

    Scale: red-part keys broadcast into the lineitem scan; the rollup
    shuffles on suppkey (|suppliers|-sized output); the final semi-join
    broadcasts that rollup into the supplier/nation side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"))
        .filter(F.col("_sq") > F.lit(300).cast(DEC))
    )
    return (
        supp.join(
            F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(300 AS DECIMAL(18,2))
)
ORDER BY s_suppkey
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue: parts whose revenue exceeds a global
    threshold — group-agg HAVING a scalar subquery over the whole
    relation. No partsupp in the synthetic schema, so "value" is
    lineitem revenue per part, and the fixed fraction is replaced by a
    scale-free one: value > 1.2x the average part value, evaluated as
    5*value*n_parts > 6*total in exact DECIMAL x BIGINT (no division,
    no float drift — the q17 trick).

    Scale: one shuffle on l_partkey for the rollup; the global
    (total, count) is a 1-row aggregate of that rollup, broadcast back
    into the filter. The fact table is read once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(revenue).alias("_val"))
    totals = per_part.agg(
        (F.sum("_val") * F.lit(6)).alias("_total6"),
        (F.count(F.lit(1)) * F.lit(5)).alias("_n5"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(F.col("_val") * F.col("_n5") > F.col("_total6"))
        .select("l_partkey", F.col("_val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


Q11_ORACLE = """
WITH v AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS val
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM v
WHERE val * (SELECT count(*) * 5 FROM v) > (SELECT sum(val) * 6 FROM v)
ORDER BY part_value DESC, l_partkey ASC
"""


def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: per return-flag counts of late lines split
    by order priority — fact-fact join + conditional CASE aggregation.
    The synthetic schema has no shipmode/commitdate/receiptdate, so
    "late" is l_shipdate > o_orderdate + 60 days and the split is
    high-priority (1-URGENT/2-HIGH) vs the rest.

    Scale: the only shuffle is orders ⋈ lineitem on orderkey (both
    facts co-partitionable/bucketable on it); the CASE sums reduce
    map-side to |return flags| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue: suppliers who were the sole late shipper on
    a finalized multi-supplier order — the hardest TPC-H shape: a fact
    self-join with EXISTS (semi) and NOT EXISTS (anti), both carrying a
    non-equi suppkey<>suppkey conjunct beside the orderkey equi-key.
    "Late" is l_shipdate > o_orderdate + 60 days (no receipt/commit
    dates in the synthetic schema).

    Scale: all three legs (late lines, the EXISTS probe, the NOT-EXISTS
    probe) hash-partition on l_orderkey — one co-partitioned key, so
    with orderkey bucketing the self-joins are shuffle-free; the
    non-equi suppkey conjunct rides along as a post-probe filter.
    supplier is broadcast; top-10 via TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    sole_late = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
            "left_semi",
        ).join(
            other_late,
            (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


Q21_ORACLE = """
SELECT s_name, numwait FROM (
  SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
  FROM supplier
  JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
  JOIN orders ON o_orderkey = l1.l_orderkey
  WHERE o_orderstatus = 'F'
    AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND o2.o_orderstatus = 'F'
                      AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
  GROUP BY s_name
) ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


def q8c_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE completion of the grouping-sets family (q8 covers ROLLUP):
    all 2^2 aggregation levels over (o_orderstatus, o_orderpriority)
    in one pass, GROUPING() flags disambiguating subtotal rows. Same
    scale shape as ROLLUP: map-side partials expand per grouping set,
    the shuffle carries |sets|x|groups| pre-reduced rows."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sum_price"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


Q8C_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


def ev2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view of the same user
    at-or-before the purchase timestamp. Spark lacks a native ASOF
    join; the naive form is an inequality join (quadratic per user).
    This is the scalable re-expression: union both event streams,
    single shuffle on user_id, and a running ``last(ignoreNulls)``
    window — O(1) state per row, sort-merge cost, no pair blowup.
    Ties resolve deterministically: at equal ts the view with the
    greatest event_id wins, and views sort before the purchases they
    may match (order key ts, is_purchase, event_id).
    """
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("_vid"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            (F.col("event_type") == "purchase").cast("int").asc(),
            F.col("event_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        both.withColumn("view_event_id", F.last("_vid", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "view_event_id")
    )


EV2_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT v.event_id FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id
FROM events p
WHERE p.event_type = 'purchase'
"""


RANGE_JOIN_SECONDS = 3600


def ev3_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: same-user event pairs within 1 hour of each other.
    The naive |t_a - t_b| <= h predicate forces a per-user cross
    product; the scale path bucketizes time into h-wide bins and
    equi-joins on (user, bin) with one side exploded to (bin-1, bin,
    bin+1) — any qualifying pair shares a bin under that expansion, so
    the exact predicate then filters a linear-ish candidate set. This
    is how Spark's own range-join hints (and KDB-style wj) work
    underneath.
    """
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_timestamp("ts") / F.lit(RANGE_JOIN_SECONDS)).cast("long").alias("_bin"),
    )
    probe = binned.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_bin"),
    )
    build = binned.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id"),
        F.col("ts").alias("ts_b"),
        "_bin",
    )
    dt = F.abs(F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a"))
    return (
        probe.join(build, on=["user_id", "_bin"])
        .filter((F.col("a_id") < F.col("b_id")) & (dt <= RANGE_JOIN_SECONDS))
        .select("user_id", "a_id", "b_id", dt.cast("long").alias("dt_seconds"))
        .dropDuplicates(["a_id", "b_id"])
    )


EV3_ORACLE = f"""
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       abs(date_diff('second', a.ts, b.ts)) AS dt_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(date_diff('second', a.ts, b.ts)) <= {RANGE_JOIN_SECONDS}
"""


def pr3_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profiling: approx_count_distinct (HyperLogLog++)
    per event type — the 100 TB form of pr1's exact distinct. Exact
    distinct shuffles every distinct key; the HLL sketch is a few KB
    per group merged map-side, so cardinality profiling costs one scan
    regardless of key cardinality. No DuckDB oracle (sketch estimates
    are engine-specific); the error bound vs the exact answer is
    asserted in tests/test_plans.py instead."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def w2_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window function family over per-user event values:
    dense_rank, ntile(4), percent_rank, cume_dist — one window pass,
    state bounded per partition (user). Completes §2.5 beyond w1's
    row_number and q2w's rank."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.dense_rank().over(w).alias("dr"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


W2_ORACLE = """
SELECT user_id, event_id,
       dense_rank()   OVER w AS dr,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC)
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 exact shape: for each PROMO part, the EUROPE supplier(s)
    offering the minimum supply cost (correlated-scalar-subquery form).
    The synthetic schema has no partsupp, so the offer relation is
    derived: min(l_extendedprice) per (partkey, suppkey).

    Scale: part + supplier⋈nation⋈region are dims → broadcast into the
    lineitem scan as semi-joins (fact never shuffles pre-agg); the
    per-part minimum is a window min over the already-aggregated offer
    relation (|parts×suppliers| rows), re-using the (partkey, suppkey)
    shuffle — the correlated subquery never rescans the fact. Top-20 by
    acctbal is TakeOrderedAndProject. Cost equality is exact (min of
    unmodified doubles — no arithmetic, no drift)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    euro_sup = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(euro_sup.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    best = offers.withColumn(
        "min_cost", F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("supply_cost") == F.col("min_cost"))
    return (
        best.join(F.broadcast(euro_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("part_key"),
            "p_name",
            "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "part_key")
        .limit(20)
    )


Q2_ORACLE = """
WITH euro_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_suppkey IN (SELECT s_suppkey FROM euro_sup)
  GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, o.l_partkey AS part_key, p_name, supply_cost
FROM offers o
JOIN euro_sup s ON o.l_suppkey = s.s_suppkey
JOIN part p ON o.l_partkey = p.p_partkey
WHERE supply_cost = (
  SELECT min(supply_cost) FROM offers o2 WHERE o2.l_partkey = o.l_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, part_key
LIMIT 20
"""


def f5_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function family over tokenized documents:
    size, array_distinct, array_contains, array_sort, slice+array_join,
    and the HOF trio transform / filter / aggregate. This is the
    expression-surface demo for array columns (the reference has no
    array types at all, SURVEY.md §1.2).

    Scale: pure per-row projection — no shuffle, no UDF. The HOF
    lambdas evaluate interpreted (SCALE.md §4 pitfall), which is
    acceptable here because work is O(tokens/row) with integer results;
    hot-path token pipelines use the exploded forms in operators/
    textops.py instead."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_max(F.transform(toks, lambda x: F.length(x))).alias("max_tok_len"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("sum_tok_len"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias("first_sorted"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
    )


F5_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       list_contains(string_split(text, ' '), 'the') AS has_the,
       list_max(list_transform(string_split(text, ' '), x -> length(x))) AS max_tok_len,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS INTEGER) AS sum_tok_len,
       array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
       list_sort(list_distinct(string_split(text, ' ')))[1] AS first_sorted,
       len(list_filter(string_split(text, ' '), x -> length(x) > 5)) AS n_long_tokens
FROM documents
"""


def w3_rolling_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based window aggregates over the event stream: moving
    sum/count/max over the last 4 rows, a 1-hour RANGE frame, and
    running totals. Completes §2.5 with explicit ROWS/RANGE frames
    (w1/w2 cover ranking; this covers sliding aggregation).

    Scale: one shuffle on user_id serves every frame; per-row state is
    O(frame) for ROWS and O(peers-in-range) for RANGE — both bounded
    by event rate, not history, so state never grows with table size.
    Sums in DECIMAL(18,6): frame contents are deterministic (unique
    (ts, event_id) order; RANGE includes tied peers symmetrically), so
    exact arithmetic makes the values engine-independent."""
    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,6)")
    rows_w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    )
    range_w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    cum_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(val).over(rows_w).cast("double").alias("moving_sum4"),
        F.count(F.lit(1)).over(rows_w).alias("moving_cnt4"),
        F.max(val).over(rows_w).cast("double").alias("moving_max4"),
        F.sum(val).over(range_w).cast("double").alias("hourly_sum"),
        F.sum(val).over(cum_w).cast("double").alias("running_sum"),
        F.count(F.lit(1)).over(cum_w).alias("running_cnt"),
    )


W3_ORACLE = """
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wr  AS DOUBLE) AS moving_sum4,
       count(*) OVER wr AS moving_cnt4,
       CAST(max(CAST(value AS DECIMAL(18,6))) OVER wr  AS DOUBLE) AS moving_max4,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wh  AS DOUBLE) AS hourly_sum,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wc  AS DOUBLE) AS running_sum,
       count(*) OVER wc AS running_cnt
FROM events
WINDOW
  wr AS (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
  wh AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
  wc AS (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


ORDER_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
PRIORITY_ALIASES = ("n_urgent", "n_high", "n_medium", "n_notspec", "n_low")


def q23_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per year × priority as one row
    per year with a column per priority. Pivot values are pinned
    explicitly — at 100 TB an unpinned pivot costs an extra distinct
    pass over the fact just to discover column names, and unbounded
    cardinality would make the row width a function of the data.

    Scale: with pinned values this is exactly a conditional-sum
    aggregate (the oracle spells it): map-side partials reduce to
    |years| rows, one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderpriority", list(ORDER_PRIORITIES))
        .agg(F.count(F.lit(1)))
    )
    renamed = wide.select(
        "order_year",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
            for v, a in zip(ORDER_PRIORITIES, PRIORITY_ALIASES)
        ],
    )
    return renamed.orderBy("order_year")


Q23_ORACLE = """
SELECT year(o_orderdate) AS order_year,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS n_urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS n_high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS n_medium,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS n_low
FROM orders
GROUP BY 1
ORDER BY 1
"""


PRICE_BUCKET_WIDTH = 50_000


def pr4_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: equi-width buckets of
    50k, with count and exact DECIMAL sum per bucket. The binning
    pattern for numeric profiling at scale — one scan, map-side
    partials, shuffle carries |buckets| rows.

    Bucket id = floor(price/width) on IEEE doubles: bit-identical in
    any engine (single division + floor), so the bucket boundaries
    cannot drift between Spark and the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(float(PRICE_BUCKET_WIDTH)))
    return (
        orders.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("bucket_total"),
        )
        .orderBy("price_bucket")
    )


PR4_ORACLE = f"""
SELECT CAST(floor(o_totalprice / {float(PRICE_BUCKET_WIDTH)}) AS BIGINT) AS price_bucket,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
FROM orders
GROUP BY 1
ORDER BY 1
"""


def q24_priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): melts the q23 pivot back to one row per
    (year, priority). Round-trips the reshaping surface — pivot and
    unpivot are inverse operators, and both must exist for a user to
    move between normalized and reporting layouts.

    Scale: unpivot is an Expand over the already-aggregated wide
    relation (|years| rows), so its cost is independent of the fact
    size; the fact scan stays pruned to the two pivot columns."""
    wide = q23_priority_pivot(spark, sf_dir)
    labeled = wide.select(
        "order_year",
        *[F.col(a).alias(v) for v, a in zip(ORDER_PRIORITIES, PRIORITY_ALIASES)],
    )
    return (
        labeled.unpivot(
            "order_year", list(ORDER_PRIORITIES), "o_orderpriority", "n_orders"
        )
        .orderBy("order_year", "o_orderpriority")
    )


Q24_ORACLE = """
WITH agg AS (
  SELECT year(o_orderdate) AS order_year,
         count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS n_urgent,
         count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS n_high,
         count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS n_medium,
         count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
         count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS n_low
  FROM orders
  GROUP BY 1
)
SELECT order_year, '1-URGENT' AS o_orderpriority, n_urgent AS n_orders FROM agg
UNION ALL
SELECT order_year, '2-HIGH', n_high FROM agg
UNION ALL
SELECT order_year, '3-MEDIUM', n_medium FROM agg
UNION ALL
SELECT order_year, '4-NOT SPECIFIED', n_notspec FROM agg
UNION ALL
SELECT order_year, '5-LOW', n_low FROM agg
ORDER BY order_year, o_orderpriority
"""


def q25_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — ((year, priority), (year), (priority)):
    non-hierarchical sets that neither ROLLUP (q8) nor CUBE (q8c) can
    express (no grand total, but both single-dimension margins).
    GROUPING() flags disambiguate subtotal NULLs from data NULLs.

    Scale: one fact scan; Expand replicates each input row once per
    grouping set *after* map-side partials would be ideal — Spark
    expands pre-agg, so the shuffle carries |sets| × |groups| partials,
    still bounded by group cardinality (years × priorities), not rows."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    return (
        o.groupingSets(
            [["order_year", "o_orderpriority"], ["order_year"], ["o_orderpriority"]],
            "order_year",
            "o_orderpriority",
        )
        .agg(
            F.grouping("order_year").cast("int").alias("g_year"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy("g_year", "g_prio", "order_year", "o_orderpriority")
    )


Q25_ORACLE = """
SELECT year(o_orderdate) AS order_year,
       o_orderpriority,
       CAST(grouping(year(o_orderdate)) AS INTEGER) AS g_year,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                        (year(o_orderdate)), (o_orderpriority))
ORDER BY g_year, g_prio, order_year, o_orderpriority
"""


def fo1_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER join: per-customer 1996
    vs 1997 order activity, classified added / churned / changed /
    stable. This is the audit primitive a CDC replicator needs to prove
    source and destination agree (the reference has no verification
    path at all — drift is invisible to it).

    Scale: both snapshot aggs shuffle on o_custkey and the full-outer
    join reuses that key, so the whole comparison is one exchange per
    side; bucketing both snapshots by custkey makes it shuffle-free.
    Totals compared as DECIMAL (exact) — a float comparison would
    misclassify rows that differ only in accumulation order."""
    orders = load_table(spark, sf_dir, "orders")

    def snap(y: int, tag: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias(f"k_{tag}"))
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum(F.col("o_totalprice").cast(DEC)).alias(f"t_{tag}"),
            )
        )

    a, b = snap(1996, "a"), snap(1997, "b")
    joined = a.join(b, a["k_a"] == b["k_b"], "full_outer")
    status = (
        F.when(F.col("k_a").isNull(), F.lit("added"))
        .when(F.col("k_b").isNull(), F.lit("churned"))
        .when(
            (F.col("n_a") != F.col("n_b")) | (F.col("t_a") != F.col("t_b")),
            F.lit("changed"),
        )
        .otherwise(F.lit("stable"))
    )
    return joined.select(
        F.coalesce(F.col("k_a"), F.col("k_b")).alias("custkey"),
        F.coalesce(F.col("n_a"), F.lit(0)).alias("n_1996"),
        F.coalesce(F.col("n_b"), F.lit(0)).alias("n_1997"),
        F.coalesce(F.col("t_a").cast("double"), F.lit(0.0)).alias("total_1996"),
        F.coalesce(F.col("t_b").cast("double"), F.lit(0.0)).alias("total_1997"),
        status.alias("status"),
    ).orderBy("custkey")


FO1_ORACLE = """
WITH a AS (
  SELECT o_custkey, count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
), b AS (
  SELECT o_custkey, count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_1996,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_1997,
       COALESCE(CAST(a.t AS DOUBLE), 0.0) AS total_1996,
       COALESCE(CAST(b.t AS DOUBLE), 0.0) AS total_1997,
       CASE WHEN a.o_custkey IS NULL THEN 'added'
            WHEN b.o_custkey IS NULL THEN 'churned'
            WHEN a.n <> b.n OR a.t <> b.t THEN 'changed'
            ELSE 'stable' END AS status
FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
ORDER BY custkey
"""


def ev4_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily activity: a (user × day) spine generated with
    sequence()+explode over the observed date range, left-joined to
    per-day aggregates with zero-fill — the densification step every
    time-series chart / forecasting feature pipeline needs (missing
    days must appear as explicit zeros, not absent rows).

    Scale: the spine is |users| × |days| — generated, never shuffled
    from the fact; the 1-row bounds aggregate and the day list
    broadcast. The per-(user, day) agg is map-side-combined before its
    single shuffle; the spine join keys on (user_id, day), the same key
    as the agg output."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(days))
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            # ISO string, not DATE: pandas materializes DuckDB DATE as
            # Timestamp but Spark DATE as datetime.date — the driver's
            # repr-strict hash would mismatch on the type alone
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("v").cast("double"), F.lit(0.0)).alias("day_total"),
        )
        .orderBy("user_id", "day")
    )


EV4_ORACLE = """
WITH bounds AS (
  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
), days AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), users AS (
  SELECT DISTINCT user_id FROM events
), daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2
)
SELECT u.user_id, CAST(d.day AS VARCHAR) AS day,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       COALESCE(CAST(v AS DOUBLE), 0.0) AS day_total
FROM users u
CROSS JOIN days d
LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day = d.day
ORDER BY u.user_id, d.day
"""


def f6_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family over document text: extract (first long
    word), count (\\b-delimited word occurrences), match test, global
    replace, and extract-all cardinality. Patterns are restricted to
    constructs with identical semantics in Java regex (Spark) and RE2
    (DuckDB): character classes, bounded repetition, \\b anchors —
    no backrefs or lookarounds.

    Scale: pure per-row projection, no shuffle, no UDF — regexes
    evaluate JVM-side inside whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_extract(t, r"[a-z]{6,}", 0).alias("first_long_word"),
        F.regexp_count(t, F.lit(r"\bthe\b")).cast("long").alias("n_the"),
        t.rlike("spark").alias("has_spark"),
        F.length(F.regexp_replace(t, r"[aeiou]", "")).cast("long").alias("len_novowels"),
        F.size(F.regexp_extract_all(t, F.lit(r"\bs[a-z]+"), 0)).cast("long").alias("n_s_words"),
    ).orderBy("doc_id")


F6_ORACLE = """
SELECT doc_id,
       regexp_extract(text, '[a-z]{6,}') AS first_long_word,
       CAST(len(regexp_extract_all(text, '\\bthe\\b')) AS BIGINT) AS n_the,
       regexp_matches(text, 'spark') AS has_spark,
       CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS len_novowels,
       CAST(len(regexp_extract_all(text, '\\bs[a-z]+')) AS BIGINT) AS n_s_words
FROM documents
ORDER BY doc_id
"""


def pr5_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact statistical moments per order priority: n, mean, sample
    variance and stddev of o_totalprice. Cross-engine float discipline:
    prices are first fixed to integer cents (round(x·100) — identical
    IEEE op in both engines), all sums run exact (BIGINT / DECIMAL), and
    the closed-form moments n·Σx² − (Σx)² are assembled in DECIMAL
    before ONE cast to double and an identical final expression tree —
    so the doubles match bit-for-bit even though variance needs
    division.

    Scale: single scan pruned to two columns, map-side partials, the
    shuffle carries |priorities| rows of four exact accumulators."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("decimal(19,0)")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("decimal(19,0)").alias("s"),
        F.sum(cents * cents).cast("decimal(28,0)").alias("ss"),
    )
    n_dec = F.col("n").cast("decimal(10,0)")
    var_num = (n_dec * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    n_d = F.col("n").cast("double")
    return agg.select(
        "o_orderpriority",
        "n",
        (F.col("s").cast("double") / (n_d * F.lit(100.0))).alias("mean_price"),
        (var_num / (n_d * (n_d - F.lit(1.0)) * F.lit(1.0e8))).alias("var_price"),
        F.sqrt(var_num / (n_d * (n_d - F.lit(1.0)) * F.lit(1.0e8))).alias("std_price"),
    ).orderBy("o_orderpriority")


PR5_ORACLE = """
WITH agg AS (
  SELECT o_orderpriority,
         count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS s,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS DECIMAL(19,0))
                  * CAST(round(o_totalprice * 100.0, 0) AS DECIMAL(19,0))) AS DECIMAL(28,0)) AS ss
  FROM orders
  GROUP BY 1
)
SELECT o_orderpriority,
       n,
       CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS mean_price,
       CAST(CAST(n AS DECIMAL(10,0)) * ss - s * s AS DOUBLE)
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * 1.0e8) AS var_price,
       sqrt(CAST(CAST(n AS DECIMAL(10,0)) * ss - s * s AS DOUBLE)
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * 1.0e8)) AS std_price
FROM agg
ORDER BY o_orderpriority
"""


def dq1_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ1 declarative constraint audit (operators/quality.py): five
    dbt/Deequ-style checks — PK uniqueness, FK integrity, accepted
    values, numeric range, not-null — each one distributed count,
    unioned into a single report frame. Violation counts (not boolean
    pass/fail) so thresholds can be applied downstream."""
    from migrator_spark.operators import quality as dq

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return dq.audit(
        [
            dq.unique_key(orders, ["o_orderkey"]),
            dq.foreign_key(orders, "o_custkey", customer, "c_custkey"),
            dq.accepted_values(orders, "o_orderstatus", ["F", "O"]),
            dq.in_range(lineitem, "l_quantity", 1, 30),
            dq.not_null(events, "props"),
        ]
    )


DQ1_ORACLE = """
SELECT 'unique(o_orderkey)' AS constraint,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'fk(o_custkey)',
       CAST(count(*) AS BIGINT)
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'accepted(o_orderstatus)',
       CAST(count_if(o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F', 'O')) AS BIGINT)
FROM orders
UNION ALL
SELECT 'range(l_quantity)',
       CAST(count_if(l_quantity IS NOT NULL
                     AND l_quantity NOT BETWEEN 1 AND 30) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'not_null(props)',
       CAST(count_if(props IS NULL) AS BIGINT)
FROM events
"""


def ev5_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV5 conversion funnel: signup → first click within 1 day →
    first purchase within 1 day of that click, counted per stage.

    Scale shape: every stage is a per-user aggregate — all three
    shuffles hash on user_id, so one Exchange is reused across stages
    (AQE); the stage frames are user-level (tiny vs the event fact) and
    the final union moves three aggregate rows. No window over the raw
    fact, no self-join of events against events."""
    events = load_table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 1 DAY")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        events.join(s, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("signup_ts"))
            & (F.col("ts") <= F.col("signup_ts") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        events.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("click_ts"))
            & (F.col("ts") <= F.col("click_ts") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.select(F.lit("1_signup").alias("stage"), "user_id")
        .unionByName(c.select(F.lit("2_click_1d").alias("stage"), "user_id"))
        .unionByName(p.select(F.lit("3_purchase_1d").alias("stage"), "user_id"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EV5_ORACLE = """
WITH s AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.signup_ts
    AND e.ts <= s.signup_ts + INTERVAL 1 DAY
  GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
    AND e.ts <= c.click_ts + INTERVAL 1 DAY
  GROUP BY 1
)
SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s
UNION ALL
SELECT '2_click_1d', CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT '3_purchase_1d', CAST(count(*) AS BIGINT) FROM p
"""


def ev6_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV6 retention cohorts: users bucketed by first-seen week, then
    distinct-active counts per (cohort_week, active_week) cell — the
    standard retention triangle.

    Scale shape: first-seen is one user_id-hash aggregate; the join
    back to events reuses that partitioning on the probe side; the
    final count_distinct partial-aggregates map-side on the (already
    co-located) user_id before the small (cohort, week) shuffle."""
    events = load_table(spark, sf_dir, "events")
    fs = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        events.join(fs, "user_id")
        .groupBy(
            "cohort_week", F.date_trunc("week", F.col("ts")).alias("active_week")
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


EV6_ORACLE = """
WITH fs AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
)
SELECT fs.cohort_week, date_trunc('week', e.ts) AS active_week,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM events e JOIN fs ON e.user_id = fs.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- round 4

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity boundary


def ev7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): split each user's event
    stream at >30-min inactivity gaps and aggregate per session — the
    batch complement of st2's streaming session windows, and the
    canonical two-window shape (boundary flag via lag, session index
    via running sum over the same sort).

    Scale: both window functions share one (user_id) partitioning and
    one (ts, event_id) sort — a single exchange + sort serves both
    (EnsureRequirements skips the second); the per-session aggregate
    then shuffles (user, session) — AQE coalesces. Gap math in exact
    epoch-micros so both engines agree bit-for-bit.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    # the running sum orders by (us, event_id) — identical order to the
    # lag window (us is injective-monotone in ts at micro precision),
    # expressed over the projected columns
    run = Window.partitionBy("user_id").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.select("user_id", "event_id", us.alias("us"), new_sess.alias("ns"))
        .withColumn("session_idx", F.sum("ns").over(run))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
    )


EV7_ORACLE = f"""
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   > {SESSION_GAP_US}
              OR lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   IS NULL
              THEN 1 ELSE 0 END AS ns
  FROM events
),
s AS (
  SELECT user_id, us,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM g
)
SELECT user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(us) AS start_us,
       max(us) AS end_us,
       max(us) - min(us) AS duration_us
FROM s
GROUP BY user_id, session_idx
"""


def dq2_spend_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier audit with EXACT arithmetic: customers
    whose lifetime spend deviates more than 2.5σ from the population
    mean — the anomaly-detection complement of dq1's declarative
    constraints, built so the outlier decision is bit-identical
    cross-engine. Floats never enter the comparison: spends are fixed
    to integer cents and the inequality

        |spend − mean| > 2.5·σ   (sample σ)

    is cross-multiplied into pure integer form

        4·(N·sc − S)²·(N−1) > 25·N·(N·SS − S²)

    evaluated in DECIMAL(38,0) (DuckDB: HUGEINT) — exact while the
    accumulators fit 38 digits. The binding term is 25·N·(N·SS − S²) ~
    25·N³·E[sc²]: at these spend scales (sc ~ 1e8 cents) that holds to
    roughly 5e6 customers, NOT unbounded — and past it Spark's non-ANSI
    decimal overflow yields NULL, which a bare filter would silently
    treat as "not an outlier". The filter therefore RAISES on a NULL
    comparison operand (DuckDB's HUGEINT symmetrically errors on
    overflow), so outgrowing the exact range is loud; the scale path
    beyond it is the float z-score with boundary tolerance.

    Scale: one pruned scan → per-customer aggregate (map-side partials);
    the per-customer relation feeds BOTH the 1-row population stats and
    the filter probe, so it is checkpointed (one evaluation — the
    cur2/dd9 discipline) and the 1-row stats broadcast back. The
    population join is a broadcast of ONE row; nothing else shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("decimal(19,0)")
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).cast("decimal(14,0)").alias("sc"),
        )
        .localCheckpoint(eager=True)
    )
    st = per.agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("N"),
        F.sum("sc").cast("decimal(19,0)").alias("S"),
        F.sum(F.col("sc") * F.col("sc")).cast("decimal(38,0)").alias("SS"),
    )
    dev = F.col("N") * F.col("sc") - F.col("S")
    lhs = dev * dev * (F.col("N") - F.lit(1)) * F.lit(4)
    rhs = (F.col("N") * F.col("SS") - F.col("S") * F.col("S")) * F.col("N") * F.lit(25)
    is_outlier = F.when(
        lhs.isNull() | rhs.isNull(),
        F.raise_error(
            "dq2_spend_outliers: DECIMAL(38,0) overflow in the exact "
            "comparison — population too large for the integer path"
        ).cast("boolean"),
    ).otherwise(lhs > rhs)
    return (
        per.join(F.broadcast(st))
        .filter(is_outlier)
        .select(
            "o_custkey",
            "n_orders",
            (F.col("sc").cast("double") / F.lit(100.0)).alias("spend"),
            F.when(dev > 0, F.lit("HIGH")).otherwise(F.lit("LOW")).alias("side"),
        )
    )


DQ2_ORACLE = """
WITH per AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS HUGEINT) AS sc
  FROM orders GROUP BY o_custkey
),
st AS (
  SELECT CAST(count(*) AS HUGEINT) AS N,
         sum(sc) AS S,
         sum(sc * sc) AS SS
  FROM per
)
SELECT o_custkey, n_orders,
       CAST(sc AS DOUBLE) / 100.0 AS spend,
       CASE WHEN N * sc - S > 0 THEN 'HIGH' ELSE 'LOW' END AS side
FROM per, st
WHERE (N * sc - S) * (N * sc - S) * (N - 1) * 4 > (N * SS - S * S) * N * 25
"""


def fo2_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 from a change stream: each event
    in a user's stream opens a validity interval that the NEXT event
    closes — (version_no, valid_from, valid_to, is_current) per row,
    open intervals marked current. This is how a migrator materializes
    history tables from CDC instead of overwriting state (the warehouse
    counterpart of l2's last-write-wins).

    One window family over a single (user_id) partitioning and
    (ts, event_id) sort serves row_number AND lead — one exchange, one
    sort, no join, no shuffle of anything but the event rows themselves.
    Interval math in exact epoch-micros.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    valid_to = F.lead(us).over(w)
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version_no"),
        F.col("event_type").alias("state"),
        us.alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    )


FO2_ORACLE = """
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS version_no,
       event_type AS state,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER w AS valid_to_us,
       lead(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


FO3_ASOF_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC, mid-stream
FO3_ASOF_TS = "2024-01-16 00:00:00"


def fo3_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time state reconstruction ("time travel") from the
    change stream: each user's latest event at-or-before T, plus how
    many versions preceded it — the read-side complement of fo2's SCD2
    materialization (fo2 builds the full history; fo3 answers one
    AS OF query against the raw stream without building it).

    The cutoff is a plain ``ts <= T`` literal predicate — pushed to the
    scan, so a time-partitioned 100 TB event log prunes every partition
    after T before anything runs. Latest-state and version-depth are
    ONE ``max_by``/``max``/``count`` aggregate (not a window): map-side
    partials reduce each task to one row per user, no sort, and the
    single exchange moves pre-combined rows. The max_by ordering key
    (us, event_id) is unique per user, so the pick is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    upto = ev.filter(F.col("ts") <= F.lit(FO3_ASOF_TS).cast("timestamp")).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    return upto.groupBy("user_id").agg(
        F.max_by(
            F.col("event_type"), F.struct(F.col("us"), F.col("event_id"))
        ).alias("state"),
        F.max("us").alias("as_of_us"),
        F.count(F.lit(1)).cast("long").alias("version_no"),
    )


FO3_ORACLE = f"""
WITH upto AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
  FROM events WHERE epoch_us(ts) <= {FO3_ASOF_US}
),
r AS (
  SELECT user_id, event_type, us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us DESC, event_id DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS version_no
  FROM upto
)
SELECT user_id, event_type AS state, us AS as_of_us, version_no
FROM r WHERE rn = 1
"""


def ev8_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix over per-user streams:
    count every consecutive (from -> to) pair and its share of the
    from-state's outgoing edges — the Markov-chain summary behind
    funnel/path analysis (ev5 checks ONE path; this profiles all of
    them).

    lead() over the (user_id) partitioning = one exchange + sort; the
    pair aggregate reduces to |event_types|^2 rows with map-side
    partials, and the probability denominator is a whole-frame window
    over that tiny aggregate — nothing after the first shuffle touches
    more than 25 rows. The share division is one IEEE op on identical
    integer operands, so the oracle compare is exact.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot).cast("double")
        ).alias("p_transition"),
    )


EV8_ORACLE = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS to_type
  FROM events
),
agg AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
         AS p_transition
FROM agg
"""


DQ3_BUCKETS = 16


def dq3_replica_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed order-independent fingerprint of the orders table
    (quality.replica_checksum): the migration-validation primitive —
    run on source and destination, diff 16 rows instead of 10^12, and
    a mismatched bucket narrows the repair to 1/16 of the key space
    (one-level Merkle; recurse with more buckets to narrow further).

    Everything is exact: money as integer cents, timestamps as
    epoch-micros, the row hash a 60-bit md5 fold, and the bucket
    aggregate an XOR (commutative, overflow-free — identical under any
    partitioning or combine order, which a SUM of hashes is not without
    128-bit headroom). One scan, one 16-group aggregate with map-side
    partials; nothing else moves.
    """
    from migrator_spark.operators.quality import replica_checksum

    o = load_table(spark, sf_dir, "orders")
    return replica_checksum(
        o,
        bucket_col="o_orderkey",
        row_cols=[
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * F.lit(100.0), 0)
            .cast("long")
            .cast("string"),
            F.unix_micros(F.col("o_orderdate")).cast("string"),
            F.col("o_orderpriority"),
        ],
        n_buckets=DQ3_BUCKETS,
    )


DQ3_ORACLE = f"""
SELECT CAST(coalesce(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                     % {DQ3_BUCKETS}, -1) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       bit_xor(('0x' || substr(md5(concat_ws('|',
           CAST(o_orderkey AS VARCHAR),
           CAST(o_custkey AS VARCHAR),
           o_orderstatus,
           CAST(CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS VARCHAR),
           CAST(epoch_us(o_orderdate) AS VARCHAR),
           o_orderpriority)), 1, 15))::BIGINT) AS xor_hash
FROM orders
GROUP BY 1
"""


def ev9_daily_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k over an aggregate: the 2 most frequent event
    types per day — the trending/leaderboard query every product
    analytics stack runs. One partial-combined (day, type) aggregate
    (|days|x|types| rows), then the rank predicate pushes into a
    WindowGroupLimit over that TINY relation — the corpus is scanned
    once and nothing after the first exchange exceeds the aggregate's
    cardinality."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("_d"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("_d").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        daily.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 2)
        .select(F.date_format("_d", "yyyy-MM-dd").alias("day"), "event_type", "n")
    )


EV9_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(day AS VARCHAR) AS day, event_type, n FROM (
  SELECT *, row_number() OVER (PARTITION BY day
                               ORDER BY n DESC, event_type ASC) AS rk
  FROM d
) WHERE rk <= 2
"""


def ev10_top_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first 5 events (by time) joined
    into an ordered path string, then the 10 most common paths — the
    "what do users actually do" query behind onboarding and funnel
    design (ev5 checks ONE hypothesized path; this discovers them).

    Shape: one user-partitioned ranking window caps each user at 5
    rows BEFORE any path assembly (WindowGroupLimit — a power user's
    million events never reach the aggregate), per-user assembly
    sorts the <=5 collected (rank, type) structs inside the row
    (array_sort — deterministic despite collect_list's arbitrary
    arrival order), and the path frequency count partial-aggregates
    into TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    first5 = (
        ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )
    paths = first5.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(10)
    )


EV10_ORACLE = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 5 GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT 10
"""


def seg1_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days since
    last order at the dataset's frontier), Frequency (order count) and
    Monetary (exact DECIMAL total), each bucketed into quintiles by
    ntile(5), concatenated into the classic 3-digit segment code — the
    standard marketing/CRM segmentation every warehouse ships.

    Shape: one partial-combined per-customer aggregate (the only
    corpus-sized shuffle), then three whole-frame ntile windows over
    the |customers| aggregate; the dataset frontier (max date) is a
    1-row broadcast. All-integer output — ntile is rank-based, so no
    float enters the compare. The deliberate ntile ordering includes
    the customer key as the tiebreak, making bucket boundaries
    deterministic cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_m"),
    )
    frontier = orders.agg(F.max("o_orderdate").alias("_frontier"))
    wr = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    wm = Window.orderBy(F.col("_m").desc(), F.col("o_custkey").asc())
    return (
        per_cust.crossJoin(F.broadcast(frontier))
        .withColumn(
            "recency_days", F.datediff(F.col("_frontier"), F.col("last_order")).cast("long")
        )
        .withColumn("r_score", F.ntile(5).over(wr).cast("long"))
        .withColumn("f_score", F.ntile(5).over(wf).cast("long"))
        .withColumn("m_score", F.ntile(5).over(wm).cast("long"))
        .select(
            "o_custkey",
            "recency_days",
            "frequency",
            F.col("_m").cast("double").alias("monetary"),
            "r_score",
            "f_score",
            "m_score",
            F.concat_ws("", "r_score", "f_score", "m_score").alias("segment"),
        )
    )


SEG1_ORACLE = """
WITH pc AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
  FROM orders GROUP BY o_custkey
),
f AS (SELECT max(o_orderdate) AS frontier FROM orders),
s AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_order, frontier) AS BIGINT) AS recency_days,
         frequency, m,
         CAST(ntile(5) OVER (ORDER BY date_diff('day', last_order, frontier) ASC,
                             o_custkey ASC) AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS BIGINT)
           AS f_score,
         CAST(ntile(5) OVER (ORDER BY m DESC, o_custkey ASC) AS BIGINT) AS m_score
  FROM pc, f
)
SELECT o_custkey, recency_days, frequency, CAST(m AS DOUBLE) AS monetary,
       r_score, f_score, m_score,
       r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
FROM s
"""


def ev11_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view -> click -> purchase:
    a user converts at step N only with an event AFTER their earliest
    step-N-1 time — the product-analytics query (Amplitude/Mixpanel
    "funnels") that ev5's single-path check doesn't generalize to.

    Shape: each stage is one event_type-pruned scan (the predicate
    pushes to parquet, so stage N reads only its own event type) into
    a per-user min aggregate, joined to the previous stage's
    users-sized frontier (AQE broadcasts it — |users| << |events|).
    Nothing ever shuffles more than one row per user; the output is
    three 1-row aggregates unioned. At 100 TB: three pruned scans +
    three user-keyed partial aggregates, no window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("_t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("_t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t3"))
    )

    def _step(df: DataFrame, n: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(n).cast("long").alias("step"),
            F.lit(name).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        _step(s1, 1, "view")
        .unionByName(_step(s2, 2, "click"))
        .unionByName(_step(s3, 3, "purchase"))
    )


EV11_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
       CAST(count(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s2
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s3
"""


def fo4_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users cohorted by first-activity week,
    counted active per (cohort, week offset) — the retention triangle
    behind every growth dashboard. "Week" is an epoch-aligned 7-day
    bucket (days-since-1970 div 7) rather than an ISO week: pure
    integer arithmetic, so no engine's week-numbering or locale
    convention can enter the compare.

    Shape: one per-user min aggregate (the cohort relation, one row
    per user), one distinct (user, activity-week) aggregate (<= 52
    rows per user per year), a users-sized join AQE broadcasts, and a
    final tiny (cohort x offset) count. Two corpus scans, both
    column-pruned to (user_id, ts); the distinct's shuffle carries
    user-weeks, not events."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")

    def week_of(d):
        return F.floor(F.datediff(d, epoch) / F.lit(7)).cast("long")

    first = ev.groupBy("user_id").agg(
        week_of(F.min(F.col("ts").cast("date"))).alias("_cw")
    )
    act = ev.select(
        "user_id", week_of(F.col("ts").cast("date")).alias("_aw")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format(
                F.date_add(epoch, (F.col("_cw") * 7).cast("int")), "yyyy-MM-dd"
            ).alias("cohort_week"),
            (F.col("_aw") - F.col("_cw")).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


FO4_ORACLE = """
WITH f AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', min(CAST(ts AS DATE))) // 7 AS cw
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS aw
  FROM events
)
SELECT strftime(DATE '1970-01-01' + INTERVAL (cw * 7) DAY, '%Y-%m-%d')
         AS cohort_week,
       CAST(aw - cw AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM a JOIN f USING (user_id)
GROUP BY cw, week_offset
"""


def ev13_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: per user, the latency from
    first 'view' to the first purchase AFTER it, histogrammed into
    hour buckets (capped at 23+) — the "how long does conversion
    take" distribution behind attribution windows and nudge timing.
    All arithmetic in integer microseconds (unix_micros / epoch_us),
    so no timestamp-precision or rounding semantics differ between
    engines.

    Shape: ev11's staged-frontier discipline — two event_type-pruned
    scans, per-user min aggregates, a users-sized broadcast join —
    then one tiny bucket count. Nothing beyond one row per user moves
    after the scans."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("_t1"))
        .groupBy("user_id", "_t1")
        .agg(F.min("ts").alias("_t2"))
    )
    lat_us = F.unix_micros(F.col("_t2")) - F.unix_micros(F.col("_t1"))
    bucket = F.least(
        F.lit(23), F.floor(lat_us / F.lit(3600000000))
    ).cast("long")
    return (
        p.groupBy(bucket.alias("hours_bucket"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EV13_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, v.t1, min(e.ts) AS t2 FROM events e
  JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.t1
  GROUP BY e.user_id, v.t1
)
SELECT CAST(least(23, (epoch_us(t2) - epoch_us(t1)) // 3600000000)
            AS BIGINT) AS hours_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM p GROUP BY 1
"""


def ev14_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the type
    of the user's most recent PRECEDING non-purchase event (view /
    click / signup / error — 'none' when the purchase opens the
    stream), with revenue in exact DECIMAL cents — the attribution
    table every marketing warehouse derives before channel-budget
    decisions.

    Shape: ONE user-keyed window (last_value IGNORE NULLS over the
    per-user time order — the running "last touch seen") computed in
    the same shuffle that sessionization pays, then a channels-sized
    aggregate. The money column aggregates as DECIMAL(18,2) — exact,
    order-independent across partitions and engines — and is cast to
    double only at the edge (the tpch.py float discipline)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("_touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("_touch"), F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


EV14_ORACLE = """
WITH t AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS UNBOUNDED PRECEDING) AS touch
  FROM events
)
SELECT coalesce(touch, 'none') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM t WHERE event_type = 'purchase'
GROUP BY 1
"""


def pr8_portable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-EXACT HyperLogLog (quality.portable_hll): distinct
    users per event type estimated from 256 registers built on the
    shared 60-bit stable hash — the sketch whose ESTIMATE is itself
    hash-gradable, upgrading the pr3/pr6 "approximate answers can only
    be rows-only checked" limitation for any engine pair that shares
    the hash. Register state folds as exact scaled dyadic integers;
    floats appear only in the per-group edge arithmetic, mirrored
    op-for-op in the oracle."""
    from migrator_spark.operators import quality as ql

    return ql.portable_hll(
        load_table(spark, sf_dir, "events"), "user_id", "event_type"
    )


PR8_ORACLE = """
WITH hv AS (
  SELECT event_type AS grp,
         (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) AS h
  FROM events
),
rr AS (
  SELECT grp, h % 256 AS bk,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - length(bin(h >> 8)) END AS rho
  FROM hv
),
rg AS (SELECT grp, bk, max(rho) AS m FROM rr GROUP BY grp, bk),
grid AS (
  SELECT grp, g.bk
  FROM (SELECT DISTINCT grp FROM rg),
       LATERAL unnest(generate_series(0, 255)) AS g(bk)
),
dn AS (
  SELECT grid.grp, grid.bk, coalesce(rg.m, 0) AS m
  FROM grid LEFT JOIN rg USING (grp, bk)
),
pg AS (
  SELECT grp,
         sum((1::BIGINT << CAST(60 - m AS INT))::HUGEINT) AS s,
         count(*) FILTER (WHERE m = 0) AS z
  FROM dn GROUP BY grp
),
es AS (
  SELECT grp, z,
         0.7213 / (1.0 + 1.079 / 256) * 256.0 * 256.0
           * 1152921504606846976.0 / CAST(s AS DOUBLE) AS raw
  FROM pg
)
SELECT grp AS event_type,
       round(CASE WHEN raw <= 640.0 AND z > 0
                  THEN 256.0 * ln(256.0 / z)
                  ELSE raw END, 6) AS hll_estimate
FROM es
"""


PR9_K = 256


def pr9_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-EXACT quantile summary (quality.sampled_quantiles):
    per event type, p50/p90/p99 of the event value estimated from the
    bottom-256 rows by the shared stable hash — the pr8 move applied to
    pr6's problem. The summary state (a deterministic bounded
    hash-sample) and the estimates (discrete rank picks, no float
    interpolation) are pure functions of the data, so the ESTIMATE
    itself is hash-graded, unlike engine-private KLL/t-digest sketches;
    pr6 remains the built-in-sketch counterpart with its pytest
    rank-error bound."""
    from migrator_spark.operators import quality as ql

    return ql.sampled_quantiles(
        load_table(spark, sf_dir, "events"),
        value_col="value",
        group_col="event_type",
        id_col="event_id",
        k=PR9_K,
    )


PR9_ORACLE = f"""
WITH b AS (
  SELECT event_type AS grp, value AS v, event_id AS id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
c AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_rows FROM b GROUP BY grp),
s AS (
  SELECT grp, v, id,
         row_number() OVER (PARTITION BY grp ORDER BY h ASC, id ASC) AS rk
  FROM b
),
r AS (
  SELECT grp, v, id,
         row_number() OVER (PARTITION BY grp ORDER BY v ASC, id ASC) AS vr
  FROM s WHERE rk <= {PR9_K}
),
j AS (
  SELECT r.grp, r.v, r.vr, c.n_rows,
         CAST(least({PR9_K}, c.n_rows) AS BIGINT) AS m
  FROM r JOIN c USING (grp)
)
SELECT grp AS event_type, n_rows, m AS n_sample,
       max(CASE WHEN vr = (1 * m + 1) // 2 THEN v END) AS p50,
       max(CASE WHEN vr = (9 * m + 9) // 10 THEN v END) AS p90,
       max(CASE WHEN vr = (99 * m + 99) // 100 THEN v END) AS p99
FROM j GROUP BY grp, n_rows, m
"""


PR10_M, PR10_K, PR10_PROBES = 8192, 4, 300


def pr10_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-EXACT Bloom membership (quality.portable_bloom):
    per event type, the user-id set feeds an m=8192/k=4 filter on the
    shared stable hash, then a fixed probe grid (ids 7j, j<300 — some
    inserted, some not at every SF) is tested against it. Filter bits,
    true positives, and the structural false positives are all pure
    functions of the data, so the verdicts hash-grade bit-for-bit —
    the membership rung of the portable-sketch ladder (pr8
    cardinality, pr9 quantiles)."""
    from migrator_spark.operators import quality as ql

    ev = load_table(spark, sf_dir, "events")
    groups = ev.select(F.col("event_type").alias("grp")).distinct()
    probes = groups.crossJoin(
        spark.range(PR10_PROBES).select((F.col("id") * 7).alias("probe_key"))
    ).select(F.col("grp").alias("event_type"), "probe_key")
    return ql.portable_bloom(
        ev.select("event_type", "user_id"),
        probes,
        key_col="user_id",
        group_col="event_type",
        m=PR10_M,
        k=PR10_K,
    )


PR10_ORACLE = f"""
WITH bits AS (
  SELECT DISTINCT event_type AS grp,
         (('0x' || substr(md5(coalesce(user_id::VARCHAR, chr(0) || 'null') || ':' || s.i::VARCHAR), 1, 15))::BIGINT)
           % {PR10_M} AS bit
  FROM events, LATERAL unnest(generate_series(0, {PR10_K - 1})) AS s(i)
),
nb AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_bits_set FROM bits GROUP BY grp),
pr AS (
  SELECT g.grp, p.j * 7 AS pk
  FROM (SELECT DISTINCT event_type AS grp FROM events) g,
       LATERAL unnest(generate_series(0, {PR10_PROBES - 1})) AS p(j)
),
pb AS (
  SELECT grp, pk,
         (('0x' || substr(md5(coalesce(pk::VARCHAR, chr(0) || 'null') || ':' || s.i::VARCHAR), 1, 15))::BIGINT)
           % {PR10_M} AS bit
  FROM pr, LATERAL unnest(generate_series(0, {PR10_K - 1})) AS s(i)
),
hits AS (
  SELECT pb.grp, pb.pk, count(*) AS h
  FROM pb JOIN bits USING (grp, bit) GROUP BY pb.grp, pb.pk
)
SELECT pr.grp AS event_type, pr.pk AS probe_key,
       coalesce(hits.h, 0) = {PR10_K} AS member, nb.n_bits_set
FROM pr
LEFT JOIN hits ON hits.grp = pr.grp AND hits.pk = pr.pk
JOIN nb ON nb.grp = pr.grp
"""


PR11_M, PR11_D = 512, 3


def pr11_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-EXACT Count-Min frequency estimates
    (quality.portable_count_min): per event type, the user-id event
    stream feeds a d=3 x m=512 sketch on the shared stable hash and
    the pr10 probe grid (ids 7j, j<300) reads it back — estimate AND
    the exact count side-by-side, so the sketch's one-sided
    overestimation is itself hash-graded. The frequency rung of the
    portable-sketch ladder (pr8 cardinality, pr9 quantiles, pr10
    membership)."""
    from migrator_spark.operators import quality as ql

    ev = load_table(spark, sf_dir, "events")
    groups = ev.select(F.col("event_type").alias("grp")).distinct()
    probes = groups.crossJoin(
        spark.range(PR10_PROBES).select((F.col("id") * 7).alias("probe_key"))
    ).select(F.col("grp").alias("event_type"), "probe_key")
    return ql.portable_count_min(
        ev.select("event_type", "user_id"),
        probes,
        key_col="user_id",
        group_col="event_type",
        m=PR11_M,
        d=PR11_D,
    )


PR11_ORACLE = f"""
WITH cells AS (
  SELECT event_type AS grp, s.i AS i,
         (('0x' || substr(md5(coalesce(user_id::VARCHAR, chr(0) || 'null') || ':' || s.i::VARCHAR), 1, 15))::BIGINT)
           % {PR11_M} AS pos,
         CAST(count(*) AS BIGINT) AS c
  FROM events, LATERAL unnest(generate_series(0, {PR11_D - 1})) AS s(i)
  GROUP BY 1, 2, 3
),
truth AS (
  SELECT event_type AS grp, user_id AS k, CAST(count(*) AS BIGINT) AS tc
  FROM events GROUP BY 1, 2
),
pr AS (
  SELECT g.grp, p.j * 7 AS pk
  FROM (SELECT DISTINCT event_type AS grp FROM events) g,
       LATERAL unnest(generate_series(0, {PR10_PROBES - 1})) AS p(j)
),
pb AS (
  SELECT grp, pk, s.i AS i,
         (('0x' || substr(md5(coalesce(pk::VARCHAR, chr(0) || 'null') || ':' || s.i::VARCHAR), 1, 15))::BIGINT)
           % {PR11_M} AS pos
  FROM pr, LATERAL unnest(generate_series(0, {PR11_D - 1})) AS s(i)
),
est AS (
  SELECT pb.grp, pb.pk, min(coalesce(cells.c, 0)) AS cm
  FROM pb LEFT JOIN cells ON cells.grp = pb.grp AND cells.i = pb.i
                         AND cells.pos = pb.pos
  GROUP BY pb.grp, pb.pk
)
SELECT est.grp AS event_type, est.pk AS probe_key,
       CAST(est.cm AS BIGINT) AS cm_estimate,
       CAST(coalesce(truth.tc, 0) AS BIGINT) AS true_count
FROM est LEFT JOIN truth ON truth.grp = est.grp AND truth.k = est.pk
"""


def ev15_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window funnel (ClickHouse ``windowFunnel`` semantics):
    per user, the MAXIMUM chain depth view -> click -> purchase
    reachable from ANY view event, with every chain event inside
    [t_view, t_view + 1 day] and non-decreasing timestamps — unlike
    ev11, which anchors each step at the user's EARLIEST previous-step
    time (a user whose first view leads nowhere but whose later view
    converts scores 3 here and can score 1 there). Output: users per
    maximum level.

    Shape: a chain-search over every candidate start is answered with
    TWO window passes over the same (user_id, ts) sort — no self-join:

      pass 1: nxt_p  = earliest purchase at-or-after each row
      pass 2: t_c    = earliest click at-or-after each row
              p_chain = min over those clicks of THEIR nxt_p

    Greedy suffix-min works because "earliest next step" weakly
    dominates any other chain continuation, and nxt_p is monotone in
    the click time, so the min over later clicks of nxt_p IS the
    greedy chain end through the earliest click. Both passes share one
    partition+order, so Spark plans a single Exchange + Sort with two
    Window nodes — at 100 TB this is one shuffle of the (pruned,
    3-of-5 event types) fact, then per-user streaming frames; state is
    O(1) per row (RANGE suffix frame, running min from the right).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
    )
    suffix = Window.partitionBy("user_id").orderBy("ts").rangeBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    p1 = ev.withColumn(
        "nxt_p",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(suffix),
    )
    p2 = p1.withColumn(
        "t_c",
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(suffix),
    ).withColumn(
        "p_chain",
        F.min(F.when(F.col("event_type") == "click", F.col("nxt_p"))).over(suffix),
    )
    lim = F.col("ts") + F.expr("INTERVAL 1 DAY")
    depth = (
        F.when(
            (F.col("t_c") <= lim) & (F.col("p_chain") <= lim), F.lit(3)
        )
        .when(F.col("t_c") <= lim, F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        p2.filter(F.col("event_type") == "view")
        .select("user_id", depth.alias("depth"))
        .groupBy("user_id")
        .agg(F.max("depth").cast("long").alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EV15_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
p1 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' THEN ts END) OVER w AS nxt_p
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
p2 AS (
  SELECT *,
         min(CASE WHEN event_type = 'click' THEN ts END) OVER w AS t_c,
         min(CASE WHEN event_type = 'click' THEN nxt_p END) OVER w AS p_chain
  FROM p1
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
lv AS (
  SELECT user_id,
         max(CASE
               WHEN t_c <= ts + INTERVAL 1 DAY
                AND p_chain <= ts + INTERVAL 1 DAY THEN 3
               WHEN t_c <= ts + INTERVAL 1 DAY THEN 2
               ELSE 1
             END) AS level
  FROM p2 WHERE event_type = 'view' GROUP BY user_id
)
SELECT CAST(level AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_users
FROM lv GROUP BY level
"""


_DQ4_EDGES = [
    # (name, child table, child key, parent table, parent key)
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def dq4_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the schema
    (plus the events fact's soft user_id reference): per edge, child
    row count, NULL-key rows (legal under ANSI FK semantics, reported
    separately), and ORPHANS — non-null child keys with no parent row.
    The pre-load validation a warehouse migration runs before trusting
    joins; the reference's CDC loader assumes intact PK/FK invariants
    and this is the query that checks them.

    Shape per edge: the child projects ONE key column (column pruning
    to the scan), the parent side collapses to distinct keys first
    (orders of magnitude smaller than the child fact), and the
    left join + conditional count aggregates map-side — AQE broadcasts
    every dim-sized parent. Eight independent arms union to 8 rows;
    at 100 TB each arm is one pruned scan + one join, no sort."""
    frames = []
    for name, child, ckey, parent, pkey in _DQ4_EDGES:
        pk = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("_pk"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        frames.append(
            load_table(spark, sf_dir, child)
            .select(F.col(ckey).alias("_pk"))
            .join(pk, "_pk", "left")
            .agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).alias("n_child"),
                F.count_if(F.col("_pk").isNull()).alias("n_null_keys"),
                F.count_if(
                    F.col("_pk").isNotNull() & F.col("_hit").isNull()
                ).alias("n_orphans"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _dq4_arm_sql(name: str, child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
SELECT '{name}' AS fk,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count(*) FILTER (WHERE c._pk IS NULL) AS BIGINT) AS n_null_keys,
       CAST(count(*) FILTER (WHERE c._pk IS NOT NULL AND p._pk IS NULL)
            AS BIGINT) AS n_orphans
FROM (SELECT {ckey} AS _pk FROM {child}) c
LEFT JOIN (SELECT DISTINCT {pkey} AS _pk FROM {parent}) p ON c._pk = p._pk
"""


DQ4_ORACLE = "\nUNION ALL\n".join(_dq4_arm_sql(*e) for e in _DQ4_EDGES)


def ev16_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) next to that day's DAU
    — the engagement/stickiness pair every product dashboard pins.
    Exact distinct-user counts over a SLIDING window, done scalably:
    instead of a per-day range self-join (|days| x fact nested loop),
    each (user, day) contribution EXPLODES into the <= 7 window days
    it serves — the classic contribution-expansion rewrite — and
    everything downstream is equi-keyed.

    Shape: the fact collapses to distinct (user, day) FIRST (one
    partial-combined aggregate — the only corpus-sized shuffle), the
    7x expansion runs on that compressed relation, the day spine join
    is a broadcast, and the final count-distinct re-shuffles
    |users x days|-bounded rows. No non-equi join anywhere, so AQE
    keeps every exchange hash-partitioned. At 100 TB: the expansion
    factor is a constant 7 on the user-day relation (~always orders
    of magnitude smaller than events), not on the fact."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    spine = ud.select("day").distinct()
    expl = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
    )
    wau = (
        expl.join(F.broadcast(spine), expl.wday == spine.day)
        .groupBy("wday")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    return (
        dau.join(wau, dau.day == wau.wday)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


EV16_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
spine AS (SELECT DISTINCT day FROM ud),
expl AS (
  SELECT user_id, CAST(t.wday AS DATE) AS wday
  FROM ud, LATERAL unnest(generate_series(
    day::TIMESTAMP, day::TIMESTAMP + INTERVAL 6 DAY, INTERVAL 1 DAY
  )) AS t(wday)
),
wau AS (
  SELECT e.wday, count(DISTINCT e.user_id) AS wau
  FROM expl e JOIN spine s ON e.wday = s.day
  GROUP BY e.wday
),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
       d.dau::DOUBLE / w.wau::DOUBLE AS stickiness
FROM dau d JOIN wau w ON d.day = w.wday
"""


FO5_ASOF_TXN = "1996-07-03"


def fo5_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal reconstruction — "what did 1996-H1 revenue look like
    AS WE KNEW IT on {txn}?" — the two-clock query (valid time =
    o_orderdate, transaction time = when a version became known) that
    separates a warehouse from an audit log, completing the fo family
    (fo1 snapshot diff, fo2 SCD2, fo3 as-of snapshot, fo4 cohorts).

    Versions are SYNTHESIZED arithmetically (the mm-family synthesis
    discipline, so the oracle can recompute them): every order's v1 is
    known at its o_orderdate; orders with o_orderkey % 10 == 0 receive
    a +10.00 price correction known 5 days later. The as-of rule picks,
    per order, the LATEST version whose transaction time is <= the
    as-of instant — corrections published after it are invisible, which
    is the whole point.

    Shape: the version relation is a 2-arm union of pruned scans (the
    valid-time slice pushes into BOTH scans), the per-key latest
    version is a WindowGroupLimit top-1, and the rollup is one
    partial-combined aggregate over |orders in slice| rows. No
    self-join, DECIMAL(18,2) money arithmetic end-to-end.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    v1 = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").alias("_vt"),
        F.col("o_orderdate").alias("_tt"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("_price"),
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").alias("_vt"),
            (F.col("o_orderdate") + F.expr("INTERVAL 5 DAY")).alias("_tt"),
            (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(10).cast("decimal(18,2)")).alias(
                "_price"
            ),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("_tt").desc())
    latest_known = (
        v1.unionByName(v2)
        .filter(F.col("_tt") <= F.lit(FO5_ASOF_TXN).cast("timestamp_ntz"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return latest_known.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("_tt") > F.col("_vt")).alias("n_corrected"),
        F.sum("_price").cast("double").alias("revenue_as_known"),
    )


FO5_ORACLE = f"""
WITH sliced AS (
  SELECT o_orderkey, o_orderpriority, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-07-01'
),
versions AS (
  SELECT o_orderkey, o_orderpriority, o_orderdate AS vt,
         o_orderdate AS tt, price FROM sliced
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_orderdate,
         o_orderdate + INTERVAL 5 DAY,
         price + CAST(10 AS DECIMAL(18,2))
  FROM sliced WHERE o_orderkey % 10 = 0
),
latest_known AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY tt DESC) AS rn
    FROM versions WHERE tt <= TIMESTAMP '{FO5_ASOF_TXN}'
  ) WHERE rn = 1
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE tt > vt) AS BIGINT) AS n_corrected,
       CAST(sum(price) AS DOUBLE) AS revenue_as_known
FROM latest_known GROUP BY o_orderpriority
"""


FO6_DROP_MOD, FO6_EXTEND_MOD, FO6_REOPEN_MOD = 7, 11, 13
FO6_EXTEND_US = 3_600_000_000  # 1 h


def _fo6_corrupted_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared deterministically-corrupted SCD2 fixture: fo6
    AUDITS it, fo7 REPAIRS it (identical corruption, so the repair's
    oracle is checkable against the audit's violation list)."""
    from migrator_spark.functions.hashing import stable_hash64

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts"))
    hist = ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version_no"),
        us.alias("valid_from_us"),
        F.lead(us).over(w).alias("valid_to_us"),
    )
    h = stable_hash64(
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.col("version_no").cast("string"),
        )
    )
    return (
        hist.withColumn("_h", h)
        .filter(F.pmod(F.col("_h"), F.lit(FO6_DROP_MOD)) != 0)
        .withColumn(
            "valid_to_us",
            F.when(
                (F.pmod(F.col("_h"), F.lit(FO6_EXTEND_MOD)) == 0)
                & F.col("valid_to_us").isNotNull(),
                F.col("valid_to_us") + F.lit(FO6_EXTEND_US),
            )
            .when(
                (F.pmod(F.col("_h"), F.lit(FO6_REOPEN_MOD)) == 0)
                & (F.pmod(F.col("_h"), F.lit(FO6_EXTEND_MOD)) != 0)
                & F.col("valid_to_us").isNotNull(),
                F.lit(None).cast("long"),
            )
            .otherwise(F.col("valid_to_us")),
        )
        .drop("_h")
    )


def fo6_scd2_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 VALIDITY AUDIT (round 8): the data-quality pass every
    history table needs before an as-of query (fo3/fo5) can be
    trusted — per key, versions must tile time with no gaps, no
    overlaps, and exactly one open (current) interval. fo2 BUILDS
    correct history; this op DETECTS corrupted history, so the query
    deliberately injects deterministic corruption first (the dq4
    injected-violation discipline): versions whose stable hash ≡ 0
    (mod 7) are DROPPED (creating gaps, and lost currents when the
    drop hits a user's last version) and surviving closed versions
    with hash ≡ 0 (mod 11) get valid_to EXTENDED by 1 h (creating
    overlaps), and surviving closed versions with hash ≡ 0 (mod 13,
    and not already extended) get valid_to NULLed — a spuriously
    REOPENED version, creating both multi_current keys and
    open-interval adjacency anomalies the `reopened_mid` arm flags
    (an open interval that is not the key's last). Output: one row per violation —
    (user_id, version_no, violation, a_us, b_us) where adjacency rows
    carry (prev end, next start) and per-key current-count rows carry
    (n_open, null).

    Shape: the history build and the adjacency audit share ONE
    (user_id)-partitioned sort (two window families, one exchange);
    the current-count check is a groupBy on the same key, planned as a
    reused exchange. Nothing shuffles but the event rows; at 100 TB
    this is one pass over the history table. All interval math in
    exact epoch-micros, hash on the shared stable hash — both sides
    reproduce bit-for-bit.
    """
    corrupted = _fo6_corrupted_history(spark, sf_dir)
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("valid_from_us").asc(), F.col("version_no").asc()
    )
    adj = (
        corrupted.withColumn("_nxt", F.lead("valid_from_us").over(w2))
        .filter(
            F.col("_nxt").isNotNull()
            & (
                F.col("valid_to_us").isNull()
                | (F.col("valid_to_us") != F.col("_nxt"))
            )
        )
        .select(
            "user_id",
            "version_no",
            F.when(F.col("valid_to_us").isNull(), "reopened_mid")
            .when(F.col("valid_to_us") < F.col("_nxt"), "gap")
            .otherwise("overlap")
            .alias("violation"),
            F.col("valid_to_us").alias("a_us"),
            F.col("_nxt").alias("b_us"),
        )
    )
    cur = (
        corrupted.groupBy("user_id")
        .agg(
            F.sum(F.col("valid_to_us").isNull().cast("long")).alias("_n_open")
        )
        .filter(F.col("_n_open") != 1)
        .select(
            "user_id",
            F.lit(None).cast("long").alias("version_no"),
            F.when(F.col("_n_open") == 0, "no_current")
            .otherwise("multi_current")
            .alias("violation"),
            F.col("_n_open").alias("a_us"),
            F.lit(None).cast("long").alias("b_us"),
        )
    )
    return adj.unionByName(cur)


FO6_ORACLE = f"""
WITH hist AS (
  SELECT user_id,
         CAST(row_number() OVER w AS BIGINT) AS version_no,
         epoch_us(ts) AS valid_from_us,
         lead(epoch_us(ts)) OVER w AS valid_to_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
hashed AS (
  SELECT *,
         ('0x' || substr(md5(user_id::VARCHAR || ':' || version_no::VARCHAR), 1, 15))::BIGINT AS h
  FROM hist
),
corrupted AS (
  SELECT user_id, version_no, valid_from_us,
         CASE WHEN h % {FO6_EXTEND_MOD} = 0 AND valid_to_us IS NOT NULL
              THEN valid_to_us + {FO6_EXTEND_US}
              WHEN h % {FO6_REOPEN_MOD} = 0 AND h % {FO6_EXTEND_MOD} <> 0
                   AND valid_to_us IS NOT NULL
              THEN NULL
              ELSE valid_to_us END AS valid_to_us
  FROM hashed WHERE h % {FO6_DROP_MOD} <> 0
),
adj AS (
  SELECT user_id, version_no,
         CASE WHEN valid_to_us IS NULL THEN 'reopened_mid'
              WHEN valid_to_us < nxt THEN 'gap' ELSE 'overlap' END AS violation,
         valid_to_us AS a_us, nxt AS b_us
  FROM (
    SELECT *, lead(valid_from_us) OVER (
      PARTITION BY user_id ORDER BY valid_from_us ASC, version_no ASC) AS nxt
    FROM corrupted)
  WHERE nxt IS NOT NULL AND (valid_to_us IS NULL OR valid_to_us <> nxt)
),
cur AS (
  SELECT user_id, CAST(NULL AS BIGINT) AS version_no,
         CASE WHEN n_open = 0 THEN 'no_current' ELSE 'multi_current' END AS violation,
         n_open AS a_us, CAST(NULL AS BIGINT) AS b_us
  FROM (
    SELECT user_id, CAST(sum(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open
    FROM corrupted GROUP BY user_id)
  WHERE n_open <> 1
)
SELECT * FROM adj UNION ALL SELECT * FROM cur
"""


def fo7_scd2_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 REPAIR (round 9, post-window): the deterministic fix for
    every violation class fo6 detects, run on the SAME corrupted
    fixture — the audit→repair pair every history table needs before
    an as-of query can be trusted again. The canonical rebuild policy:
    per key, order the surviving versions by (valid_from, version_no)
    and set every valid_to to the NEXT version's valid_from — trimming
    overlaps (extended intervals are cut back to the successor),
    closing gaps (the predecessor absorbs the dropped version's span —
    the standard last-known-state reading of missing history),
    re-closing spuriously reopened mid-history versions, and leaving
    exactly the last version open (repairing both multi_current and
    no_current keys). The output tiles time per key with exactly one
    current row BY CONSTRUCTION — fo6 over this output returns zero
    rows, pinned in tests.

    Shape: one (user_id)-partitioned sort shared by the rebuild's
    lead window — one exchange over the history rows, no join; at
    100 TB this is one pass over the history table, the same cost
    class as the audit."""
    corrupted = _fo6_corrupted_history(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("valid_from_us").asc(), F.col("version_no").asc()
    )
    nxt = F.lead("valid_from_us").over(w)
    return corrupted.select(
        "user_id",
        "version_no",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


FO7_ORACLE = f"""
WITH hist AS (
  SELECT user_id,
         CAST(row_number() OVER w AS BIGINT) AS version_no,
         epoch_us(ts) AS valid_from_us,
         lead(epoch_us(ts)) OVER w AS valid_to_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
hashed AS (
  SELECT *,
         ('0x' || substr(md5(user_id::VARCHAR || ':' || version_no::VARCHAR), 1, 15))::BIGINT AS h
  FROM hist
),
corrupted AS (
  SELECT user_id, version_no, valid_from_us,
         CASE WHEN h % {FO6_EXTEND_MOD} = 0 AND valid_to_us IS NOT NULL
              THEN valid_to_us + {FO6_EXTEND_US}
              WHEN h % {FO6_REOPEN_MOD} = 0 AND h % {FO6_EXTEND_MOD} <> 0
                   AND valid_to_us IS NOT NULL
              THEN NULL
              ELSE valid_to_us END AS valid_to_us
  FROM hashed WHERE h % {FO6_DROP_MOD} <> 0
)
SELECT user_id, version_no, valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us,
       lead(valid_from_us) OVER w2 IS NULL AS is_current
FROM corrupted
WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us ASC, version_no ASC)
"""


def window_funnel_n(
    ev: DataFrame,
    steps: "tuple[str, ...]",
    window_interval: str = "INTERVAL 1 DAY",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """N-step windowFunnel (round 8): ev15's two-pass suffix-min
    algorithm generalized to ANY chain length — ClickHouse
    windowFunnel takes arbitrary step lists; the repo's hand-built
    3-step form becomes the N=3 case of this builder. Per user, the
    maximum chain depth step1 -> ... -> stepN reachable from ANY
    step-1 event, whole chain inside [t1, t1 + window], timestamps
    non-decreasing. Output: (level, n_users).

    The recurrence: comp[j..k](row) = earliest completion time of
    steps j..k, each at-or-after its predecessor, starting at-or-after
    ``row`` = suffix-min over step-j rows of comp[j+1..k] — so depth-d
    chains derive from depth-(d-1) chains in one more window pass.
    All passes share ONE (user, ts) sort: Spark plans a single
    Exchange + Sort with N-1 Window nodes (the ev15 shape, deeper).
    comp[2..k] is non-decreasing in k, so the level test is the
    greatest k whose chain completes inside the window — one CASE.
    Greedy-earliest dominance (the ev15 proof) applies per stage:
    the earliest next-step completion weakly dominates any other
    continuation, so suffix mins lose nothing.

    Scale: one shuffle of the step-pruned event relation; every pass
    is a per-user streaming RANGE frame with O(1) state per row;
    column count grows as N(N-1)/2 but rows never re-shuffle.
    """
    n = len(steps)
    if n < 2:
        raise ValueError("a funnel needs at least 2 steps")
    suffix = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    df = ev.filter(F.col(type_col).isin(*steps)).select(
        user_col, ts_col, type_col
    )
    cols: dict[tuple[int, int], str] = {}
    for k in range(2, n + 1):  # depth-0: per-step suffix-min ts
        cname = f"_c{k}_{k}"
        df = df.withColumn(
            cname,
            F.min(
                F.when(F.col(type_col) == steps[k - 1], F.col(ts_col))
            ).over(suffix),
        )
        cols[(k, k)] = cname
    for depth in range(1, n - 1):  # deeper chains from shallower ones
        for j in range(2, n + 1 - depth):
            k = j + depth
            cname = f"_c{j}_{k}"
            df = df.withColumn(
                cname,
                F.min(
                    F.when(
                        F.col(type_col) == steps[j - 1],
                        F.col(cols[(j + 1, k)]),
                    )
                ).over(suffix),
            )
            cols[(j, k)] = cname
    lim = F.col(ts_col) + F.expr(window_interval)
    depth_expr = F.lit(1)
    for k in range(2, n + 1):  # comp[2..k] monotone in k: greatest wins
        depth_expr = F.when(F.col(cols[(2, k)]) <= lim, F.lit(k)).otherwise(
            depth_expr
        )
    return (
        df.filter(F.col(type_col) == steps[0])
        .select(user_col, depth_expr.alias("depth"))
        .groupBy(user_col)
        .agg(F.max("depth").cast("long").alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EV17_STEPS = ("signup", "view", "click", "purchase")


def ev17_window_funnel4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-step windowFunnel signup -> view -> click -> purchase — the
    N-step builder (window_funnel_n) graded at a depth the hand-built
    ev15 cannot express; brute-force-checked on random streams in
    tests/test_round8_properties.py."""
    return window_funnel_n(
        load_table(spark, sf_dir, "events"), EV17_STEPS
    )


EV17_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('signup', 'view', 'click', 'purchase')
),
p1 AS (
  SELECT *,
         min(CASE WHEN event_type = 'view' THEN ts END) OVER w AS c22,
         min(CASE WHEN event_type = 'click' THEN ts END) OVER w AS c33,
         min(CASE WHEN event_type = 'purchase' THEN ts END) OVER w AS c44
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
p2 AS (
  SELECT *,
         min(CASE WHEN event_type = 'view' THEN c33 END) OVER w AS c23,
         min(CASE WHEN event_type = 'click' THEN c44 END) OVER w AS c34
  FROM p1
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
p3 AS (
  SELECT *,
         min(CASE WHEN event_type = 'view' THEN c34 END) OVER w AS c24
  FROM p2
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
lv AS (
  SELECT user_id,
         max(CASE WHEN c24 <= ts + INTERVAL 1 DAY THEN 4
                  WHEN c23 <= ts + INTERVAL 1 DAY THEN 3
                  WHEN c22 <= ts + INTERVAL 1 DAY THEN 2
                  ELSE 1 END) AS level
  FROM p3 WHERE event_type = 'signup' GROUP BY user_id
)
SELECT CAST(level AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_users
FROM lv GROUP BY level
"""


def ev18_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING (round 9, post-window): the weekly
    new / retained / resurrected / churned user decomposition behind
    every growth dashboard (the classic "growth accounting" identity:
    actives(w) = new + retained + resurrected; churned(w) = users
    active in w-1 and silent in w). Weeks are epoch-aligned 7-day
    integer buckets (fo4's discipline — no engine week-numbering or
    locale can enter the compare). A user's status per active week
    derives from the LAG of their distinct activity weeks:
    no previous week = new, previous == w-1 = retained, previous
    < w-1 = resurrected; churn is attributed to week w+1 for every
    active week w whose NEXT activity week is not w+1 (bounded by the
    corpus's global max week, so the final week churns nobody into an
    unobserved week). Output weeks are the union of activity weeks
    and churn-only weeks.

    Shape: one distinct (user, week) aggregate (<= 52 rows per user
    per year), ONE per-user sort shared by the lag and lead windows,
    a 1-row global max broadcast, and two tiny per-week count
    aggregates unioned — the corpus is scanned once, column-pruned to
    (user_id, ts)."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")
    act = (
        ev.select(
            "user_id",
            F.floor(F.datediff(F.col("ts").cast("date"), epoch) / F.lit(7))
            .cast("long")
            .alias("w"),
        )
        .distinct()
    )
    win = Window.partitionBy("user_id").orderBy("w")
    a = act.withColumn("prev", F.lag("w").over(win)).withColumn(
        "nxt", F.lead("w").over(win)
    )
    status = a.select(
        "w",
        F.when(F.col("prev").isNull(), "new")
        .when(F.col("prev") == F.col("w") - 1, "retained")
        .otherwise("resurrected")
        .alias("st"),
    )
    max_w = act.agg(F.max("w").alias("_mx"))
    churn = (
        a.filter(F.col("nxt").isNull() | (F.col("nxt") > F.col("w") + 1))
        .select((F.col("w") + 1).alias("w"))
        .join(F.broadcast(max_w), F.col("w") <= F.col("_mx"))
        .select("w")
    )
    per_week = status.groupBy("w").agg(
        F.count(F.when(F.col("st") == "new", 1)).alias("n_new"),
        F.count(F.when(F.col("st") == "retained", 1)).alias("n_retained"),
        F.count(F.when(F.col("st") == "resurrected", 1)).alias(
            "n_resurrected"
        ),
    )
    churned = churn.groupBy("w").agg(F.count(F.lit(1)).alias("n_churned"))
    weeks = per_week.join(churned, "w", "full_outer")
    return weeks.select(
        F.date_format(
            F.date_add(epoch, (F.col("w") * 7).cast("int")), "yyyy-MM-dd"
        ).alias("week_start"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
        F.coalesce("n_resurrected", F.lit(0))
        .cast("long")
        .alias("n_resurrected"),
        F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
    )


EV18_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS w
  FROM events
),
a AS (
  SELECT user_id, w,
         lag(w)  OVER (PARTITION BY user_id ORDER BY w) AS prev,
         lead(w) OVER (PARTITION BY user_id ORDER BY w) AS nxt
  FROM act
),
status AS (
  SELECT w,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN prev = w - 1 THEN 'retained'
              ELSE 'resurrected' END AS st
  FROM a
),
per_week AS (
  SELECT w,
         count(CASE WHEN st = 'new' THEN 1 END) AS n_new,
         count(CASE WHEN st = 'retained' THEN 1 END) AS n_retained,
         count(CASE WHEN st = 'resurrected' THEN 1 END) AS n_resurrected
  FROM status GROUP BY w
),
churn AS (
  SELECT w + 1 AS w FROM a
  WHERE (nxt IS NULL OR nxt > w + 1)
    AND w + 1 <= (SELECT max(w) FROM act)
),
churned AS (SELECT w, count(*) AS n_churned FROM churn GROUP BY w)
SELECT strftime(DATE '1970-01-01' + to_days(CAST(coalesce(p.w, c.w) * 7 AS INTEGER)), '%Y-%m-%d') AS week_start,
       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
       CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
FROM per_week p FULL OUTER JOIN churned c ON c.w = p.w
"""


DQ5_SLICE_MOD = 4  # release A = the cur11 ~75% id-hash slice


def dq5_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELEASE-TO-RELEASE PROFILE DRIFT (round 9, post-window): the
    data-contract audit a pipeline runs before publishing a corpus
    refresh — per tracked column, exact profile metrics for release A
    (the cur11 ~75% id-hash slice) vs release B (the grown corpus)
    and the relative drift in integer parts-per-million
    ((b-a)*1e6 div a — exact integer arithmetic, no float in the
    compare). Metrics: row count, null count and distinct count for
    the categorical columns (lang, source), min/max/sum for the
    numeric n_chars. A threshold is deliberately NOT baked in: the
    row set IS the contract surface; alerting picks its own bound.

    Shape: ONE corpus scan computing both releases' aggregates as
    conditional aggregates over the slice predicate (no second scan,
    no join), then a constant-width unpivot into (column, metric)
    rows — 12 rows total whatever the corpus size."""
    from migrator_spark.functions.hashing import stable_hash64

    docs = load_table(spark, sf_dir, "documents")
    in_a = (
        F.pmod(
            stable_hash64(F.col("doc_id").cast("string")),
            F.lit(DQ5_SLICE_MOD),
        )
        != 0
    )

    def both(metric_col, a_expr, b_expr):
        return [a_expr.alias(f"a_{metric_col}"), b_expr.alias(f"b_{metric_col}")]

    agg = docs.agg(
        *both("rows", F.count(F.when(in_a, 1)), F.count(F.lit(1))),
        *both(
            "lang_nulls",
            F.count(F.when(in_a & F.col("lang").isNull(), 1)),
            F.count(F.when(F.col("lang").isNull(), 1)),
        ),
        *both(
            "lang_distinct",
            F.count_distinct(F.when(in_a, F.col("lang"))),
            F.count_distinct(F.col("lang")),
        ),
        *both(
            "source_nulls",
            F.count(F.when(in_a & F.col("source").isNull(), 1)),
            F.count(F.when(F.col("source").isNull(), 1)),
        ),
        *both(
            "source_distinct",
            F.count_distinct(F.when(in_a, F.col("source"))),
            F.count_distinct(F.col("source")),
        ),
        *both(
            "n_chars_min",
            F.min(F.when(in_a, F.col("n_chars"))),
            F.min("n_chars"),
        ),
        *both(
            "n_chars_max",
            F.max(F.when(in_a, F.col("n_chars"))),
            F.max("n_chars"),
        ),
        *both(
            "n_chars_sum",
            F.sum(F.when(in_a, F.col("n_chars"))),
            F.sum("n_chars"),
        ),
    )
    metrics = [
        ("corpus", "rows"),
        ("lang", "lang_nulls"),
        ("lang", "lang_distinct"),
        ("source", "source_nulls"),
        ("source", "source_distinct"),
        ("n_chars", "n_chars_min"),
        ("n_chars", "n_chars_max"),
        ("n_chars", "n_chars_sum"),
    ]
    stack = ", ".join(
        f"'{col}', '{m}', CAST(a_{m} AS BIGINT), CAST(b_{m} AS BIGINT)"
        for col, m in metrics
    )
    rows = agg.selectExpr(
        f"stack({len(metrics)}, {stack}) AS (column_name, metric, val_a, val_b)"
    )
    # `div` (Spark) and `//` (DuckDB) both truncate toward zero on
    # integers (verified empirically) — the quotient is exact and
    # engine-identical, including for the negative-drift n_chars_min
    return rows.withColumn(
        "drift_ppm",
        F.when(
            F.col("val_a") != 0,
            F.expr("((val_b - val_a) * 1000000) div val_a"),
        ).cast("long"),
    )


DQ5_ORACLE = f"""
WITH tagged AS (
  SELECT *,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % {DQ5_SLICE_MOD}) <> 0 AS in_a
  FROM documents
),
agg AS (
  SELECT
    count(CASE WHEN in_a THEN 1 END) AS a_rows, count(*) AS b_rows,
    count(CASE WHEN in_a AND lang IS NULL THEN 1 END) AS a_lang_nulls,
    count(CASE WHEN lang IS NULL THEN 1 END) AS b_lang_nulls,
    count(DISTINCT CASE WHEN in_a THEN lang END) AS a_lang_distinct,
    count(DISTINCT lang) AS b_lang_distinct,
    count(CASE WHEN in_a AND source IS NULL THEN 1 END) AS a_source_nulls,
    count(CASE WHEN source IS NULL THEN 1 END) AS b_source_nulls,
    count(DISTINCT CASE WHEN in_a THEN source END) AS a_source_distinct,
    count(DISTINCT source) AS b_source_distinct,
    min(CASE WHEN in_a THEN n_chars END) AS a_n_chars_min, min(n_chars) AS b_n_chars_min,
    max(CASE WHEN in_a THEN n_chars END) AS a_n_chars_max, max(n_chars) AS b_n_chars_max,
    sum(CASE WHEN in_a THEN n_chars END) AS a_n_chars_sum, sum(n_chars) AS b_n_chars_sum
  FROM tagged
),
rows_out(column_name, metric, val_a, val_b) AS (
  SELECT 'corpus', 'rows', CAST(a_rows AS BIGINT), CAST(b_rows AS BIGINT) FROM agg
  UNION ALL SELECT 'lang', 'lang_nulls', CAST(a_lang_nulls AS BIGINT), CAST(b_lang_nulls AS BIGINT) FROM agg
  UNION ALL SELECT 'lang', 'lang_distinct', CAST(a_lang_distinct AS BIGINT), CAST(b_lang_distinct AS BIGINT) FROM agg
  UNION ALL SELECT 'source', 'source_nulls', CAST(a_source_nulls AS BIGINT), CAST(b_source_nulls AS BIGINT) FROM agg
  UNION ALL SELECT 'source', 'source_distinct', CAST(a_source_distinct AS BIGINT), CAST(b_source_distinct AS BIGINT) FROM agg
  UNION ALL SELECT 'n_chars', 'n_chars_min', CAST(a_n_chars_min AS BIGINT), CAST(b_n_chars_min AS BIGINT) FROM agg
  UNION ALL SELECT 'n_chars', 'n_chars_max', CAST(a_n_chars_max AS BIGINT), CAST(b_n_chars_max AS BIGINT) FROM agg
  UNION ALL SELECT 'n_chars', 'n_chars_sum', CAST(a_n_chars_sum AS BIGINT), CAST(b_n_chars_sum AS BIGINT) FROM agg
)
SELECT column_name, metric, val_a, val_b,
       CASE WHEN val_a <> 0
            THEN CAST(((val_b - val_a) * 1000000) // val_a AS BIGINT)
            END AS drift_ppm
FROM rows_out
"""


def pr15_federated_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEDERATED SKETCH-STATE MERGE (round 9, post-window): pr9's
    bottom-k quantile summary built INDEPENDENTLY on three disjoint
    event shards (event_id-hash mod 3 — three "sites" whose raw rows
    never cross the boundary), merged by union + re-bottom-k with
    counts summed, quantiles picked from the merged state
    (quality.sampled_quantiles_federated). The graded contract is
    pr14's move applied to the quantile rung: the oracle IS pr9's
    oracle, unchanged — merge exactness (every global bottom-k row
    survives its own shard's bottom-k) makes the federated result
    bit-identical to the directly-built summary, so a lost shard, a
    double-merged state, or a rank off-by-one lands as a hash miss.
    This is the property that lets a 1000-executor profiling pass (or
    N data centers) combine O(k)-sized states instead of re-scanning
    history."""
    from migrator_spark.operators import quality as ql

    return ql.sampled_quantiles_federated(
        load_table(spark, sf_dir, "events"),
        value_col="value",
        group_col="event_type",
        id_col="event_id",
        shard_col=F.pmod(F.xxhash64("event_id"), F.lit(3)),
    )


# merge exactness: the federated build must equal the direct build
# bit-for-bit — same oracle as pr9 by construction
PR15_ORACLE = PR9_ORACLE
