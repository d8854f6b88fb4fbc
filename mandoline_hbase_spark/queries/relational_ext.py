"""Extended relational catalog: deeper TPC-H adaptations + join/UDF surface.

The fixture schema lacks partsupp and several TPC-H columns (shipmode,
commitdate, phone, mfgr), so Q7/8/9/12/13/15/17/19/22 are adapted to the
columns that exist (FIXTURES.md §B) while keeping each query's
*structural* challenge intact: multi-way joins, correlated aggregates,
disjunctive predicates, scalar subqueries, distribution histograms.

Also registers the as-of join and range join operators
(operators/joins.py) over the events table — the as-of join is the
generalization of the reference's find-index latest-<=-bound resolution
(hbase.clj:184-198) to arbitrary time series — plus pivot, grouping
sets, exact percentiles, and a vectorized pandas UDF with full oracle
parity (the UDF surface is Arrow-batched, never row-at-a-time Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mandoline_hbase_spark.operators.joins import asof_join, range_join
from mandoline_hbase_spark.queries.catalog import register
from mandoline_hbase_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# q7_nation_volume — TPC-H Q7 (adapted): bidirectional trade volume between
# two nations by year. Two independent nation joins (supplier side and
# customer side) — both broadcast; lineitem-orders shuffles on orderkey.
# --------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7 adapted: trade volume between two nations by year",
    tags=("tpch", "join", "aggregate"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        supplier.join(lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q8_market_share — TPC-H Q8 (adapted): NATION_1 suppliers' share of PROMO
# revenue to ASIA customers, by year. Conditional aggregation over a 7-way
# join; all dimensions broadcast.
# --------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                     / sum(volume), 4) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    description="TPC-H Q8 adapted: supplier-nation market share by year",
    tags=("tpch", "join", "aggregate"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select("n_nationkey", "n_regionkey")
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# q9_profit_by_nation_year — TPC-H Q9 (adapted: no partsupp, so supply cost
# is modeled as 10% of retail price x quantity).
# --------------------------------------------------------------------------
@register(
    "q9_profit_by_nation_year",
    oracle="""
        SELECT n_name AS nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (
            SELECT n_name,
                   year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount)
                       - 0.1 * p_retailprice * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        )
        GROUP BY n_name, o_year
        ORDER BY nation, o_year DESC
    """,
    description="TPC-H Q9 adapted: profit by supplier nation and year",
    tags=("tpch", "join", "aggregate"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# q12_priority_lines — TPC-H Q12 (adapted: no shipmode, classify by
# returnflag): urgent vs non-urgent order counts per line status.
# --------------------------------------------------------------------------
@register(
    "q12_priority_lines",
    oracle="""
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    description="TPC-H Q12 adapted: priority line counts by status",
    tags=("tpch", "join", "aggregate", "conditional"),
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# q13_customer_distribution — TPC-H Q13: orders-per-customer histogram.
# Left join (customers with zero orders count too) + double aggregation.
# --------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13: distribution of orders per customer",
    tags=("tpch", "join", "aggregate", "histogram"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15: quarterly revenue per supplier, return the
# max-revenue supplier(s). Scalar-subquery (global max) joined back.
# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    description="TPC-H Q15: top supplier by quarterly revenue (scalar subquery)",
    tags=("tpch", "aggregate", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q16_supplier_counts — TPC-H Q16 (adapted: supplier linkage via lineitem,
# no partsupp): distinct suppliers per brand/type. countDistinct after a
# broadcast join; deterministic top-20 (full key in the sort).
# --------------------------------------------------------------------------
@register(
    "q16_supplier_counts",
    oracle="""
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
        LIMIT 20
    """,
    description="TPC-H Q16 adapted: distinct supplier count per brand/type",
    tags=("tpch", "join", "distinct", "topk"),
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q17_small_quantity — TPC-H Q17: revenue from below-half-average-quantity
# orders of one brand. Correlated per-part average -> window, no self-join.
# --------------------------------------------------------------------------
@register(
    "q17_small_quantity",
    oracle="""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM (
            SELECT l_extendedprice,
                   l_quantity,
                   avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
        )
        WHERE l_quantity < 0.5 * avg_qty
    """,
    description="TPC-H Q17: small-quantity revenue via per-part window average",
    tags=("tpch", "window", "aggregate"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    lineitem = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# q19_discounted_revenue — TPC-H Q19: disjunctive multi-attribute predicate
# (brand x size x quantity bands). One join; predicate entirely pushable.
# --------------------------------------------------------------------------
@register(
    "q19_discounted_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    description="TPC-H Q19: disjunctive predicate revenue",
    tags=("tpch", "join", "filter"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 50))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# q22_idle_customers — TPC-H Q22 (adapted): wealthy customers (above-average
# balance) with no urgent orders, grouped by nation. Scalar subquery + anti
# join. ("No orders at all" is empty at every synthetic SF — the urgent
# restriction keeps the row non-vacuous.)
# --------------------------------------------------------------------------
@register(
    "q22_idle_customers",
    oracle="""
        SELECT n_name AS nation,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY n_name
        ORDER BY n_name
    """,
    description="TPC-H Q22 adapted: wealthy urgent-order-free customers by nation",
    tags=("tpch", "antijoin", "subquery", "aggregate"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        customer.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# asof_attribution — as-of join: attribute each purchase to the user's
# latest click at-or-before it (union+window merge; one shuffle on user).
# --------------------------------------------------------------------------
@register(
    "asof_attribution",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               c.event_id AS click_id,
               round(c.value, 4) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
            ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    description="As-of join: latest click before each purchase per user",
    tags=("asof", "join", "events"),
)
def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "ts",
        F.round("value", 4).alias("click_value"),
    )
    return asof_join(
        purchases, clicks, on="ts", by="user_id", right_cols=["click_id", "click_value"]
    ).select("event_id", "user_id", "click_id", "click_value").orderBy("event_id")


# --------------------------------------------------------------------------
# range_join_follow_clicks — interval join: clicks within 1 hour AFTER each
# purchase by the same user.
# --------------------------------------------------------------------------
@register(
    "range_join_follow_clicks",
    oracle="""
        SELECT p.event_id,
               count(*) AS n_follow_clicks,
               round(sum(c.value), 4) AS follow_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts
         AND c.ts <= p.ts + INTERVAL 1 HOUR
        GROUP BY p.event_id
        ORDER BY p.event_id
    """,
    description="Range join: clicks within 1h after each purchase",
    tags=("rangejoin", "join", "events"),
)
def range_join_follow_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value"
    )
    joined = range_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        lower=F.expr("INTERVAL 0 SECONDS"),
        upper=F.expr("INTERVAL 1 HOUR"),
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow_clicks"),
            F.round(F.sum("value"), 4).alias("follow_value"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# pivot_qty_by_flag_status — pivot: quantity totals, linestatus x returnflag.
# --------------------------------------------------------------------------
@register(
    "pivot_qty_by_flag_status",
    oracle="""
        SELECT l_linestatus,
               round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 2) AS qty_A,
               round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END), 2) AS qty_N,
               round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS qty_R
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    description="Pivot: quantity by linestatus x returnflag",
    tags=("pivot", "aggregate"),
)
def pivot_qty_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        lineitem.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pivoted.select(
        "l_linestatus",
        F.coalesce(F.col("A"), F.lit(0.0)).alias("qty_A"),
        F.coalesce(F.col("N"), F.lit(0.0)).alias("qty_N"),
        F.coalesce(F.col("R"), F.lit(0.0)).alias("qty_R"),
    ).orderBy("l_linestatus")


# --------------------------------------------------------------------------
# grouping_sets_revenue — explicit GROUPING SETS (finer than cube/rollup).
# --------------------------------------------------------------------------
@register(
    "grouping_sets_revenue",
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
    """,
    description="GROUPING SETS revenue: per-flag, per-status, grand total",
    tags=("aggregate", "groupingsets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


# --------------------------------------------------------------------------
# percentiles_by_segment — exact interpolated percentiles per segment.
# Spark `percentile` and DuckDB `quantile_cont` share the continuous
# interpolation definition, so values agree bit-for-bit after rounding.
# --------------------------------------------------------------------------
@register(
    "percentiles_by_segment",
    oracle="""
        SELECT c_mktsegment,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
               count(*) AS n_orders
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Exact p50/p90 order price per market segment",
    tags=("aggregate", "percentile"),
)
def percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# pandas_udf_price_score — vectorized (Arrow) pandas UDF with exact oracle
# parity: the UDF surface of the engine, never row-at-a-time Python.
# --------------------------------------------------------------------------
def _price_score_udf():
    # built lazily: registering a pandas_udf requires an active SparkSession,
    # which does not exist at catalog import time
    @pandas_udf("double")
    def _price_score(totalprice: pd.Series, acctbal: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(totalprice) * 0.5 + acctbal / 1000.0

    return _price_score


@register(
    "pandas_udf_price_score",
    oracle="""
        SELECT o_orderkey,
               round(ln(1 + o_totalprice) * 0.5 + c_acctbal / 1000.0, 4) AS score
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey
        LIMIT 1000
    """,
    description="Vectorized pandas UDF scoring (Arrow batches, oracle-checked)",
    tags=("udf", "pandas", "join"),
)
def pandas_udf_price_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    score = _price_score_udf()
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            F.round(score(F.col("o_totalprice"), F.col("c_acctbal")), 4).alias(
                "score"
            ),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# approx_percentiles_by_segment — the sketch-scale path for percentiles.
# percentile_approx (Greenwald-Khanna) is mergeable across partitions:
# at 100 TB the exact sort-based percentile's full shuffle of every value
# is replaced by fixed-size per-partition sketches. Approximate by
# construction, so rows-only; accuracy is pinned against the exact
# variant in tests/test_scale_ops.py.
# --------------------------------------------------------------------------
@register(
    "approx_percentiles_by_segment",
    oracle="""
        WITH j AS (
            SELECT c_mktsegment, o_totalprice
            FROM customer JOIN orders ON c_custkey = o_custkey
        )
        SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
               true AS p50_rank_ok, true AS p90_rank_ok
        FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="Mergeable-sketch p50/p90 per segment (percentile_approx)",
    tags=("aggregate", "percentile", "sketch", "scale-path"),
)
def approx_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GK's contract is a rank-error bound (eps = 1/accuracy): verify it
    # IN-PLAN — the true rank of each returned quantile must sit within
    # eps (+ tie slack) of the target — and hash that claim with the
    # exact group counts; the sketch values themselves are
    # engine-specific and never leave the plan.
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = customer.join(orders, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_mktsegment", "o_totalprice"
    )
    est = j.groupBy("c_mktsegment").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("_p50"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("_p90"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    ranked = (
        j.join(F.broadcast(est), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            (
                F.sum(F.when(F.col("o_totalprice") <= F.col("_p50"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("_r50"),
            (
                F.sum(F.when(F.col("o_totalprice") <= F.col("_p90"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("_r90"),
        )
    )
    eps = 0.01  # accuracy=10000 -> eps 1e-4; 1% absorbs duplicate-value ties
    return (
        est.join(ranked, "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_orders",
            (F.abs(F.col("_r50") - 0.5) <= eps).alias("p50_rank_ok"),
            (F.abs(F.col("_r90") - 0.9) <= eps).alias("p90_rank_ok"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# skyline_parts — Pareto-optimal set, an operator Spark SQL lacks
# (pattern ref: "Integration of Skyline Queries into Spark SQL", EDBT'23).
# Two-phase distributed BNL: partition-local skyline via mapInPandas,
# one-task global merge of the (small) local survivors. The oracle is the
# dominance definition itself as a NOT EXISTS anti-join.
# --------------------------------------------------------------------------
@register(
    "skyline_parts",
    oracle="""
        SELECT a.p_partkey, a.p_retailprice, a.p_size
        FROM part a
        WHERE NOT EXISTS (
            SELECT 1 FROM part b
            WHERE b.p_retailprice <= a.p_retailprice
              AND b.p_size >= a.p_size
              AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
        )
    """,
    description="Skyline of parts: minimize retail price, maximize size",
    tags=("skyline", "pareto", "operator"),
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mandoline_hbase_spark.operators.skyline import skyline

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    return skyline(part, ["p_retailprice", "p_size"], ["min", "max"])


@register(
    "quality_decile_bins",
    oracle="""
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(q), 4) AS min_q,
           round(max(q), 4) AS max_q
    FROM (
        SELECT CAST(ntile(10) OVER (ORDER BY q DESC, doc_id ASC) AS BIGINT) AS bin,
               q, doc_id
        FROM (
            SELECT doc_id,
                   least(len(regexp_extract_all(text,
                       '\\b(?:the|of|and|to|in|is|it|a)\\b'))
                       / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
                          END, 1) * 4.0, 1.0) * 0.4
                   + (1.0 - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                          / greatest(length(text), 1)) * 0.3
                   + least(length(text) / 500.0, 1.0) * 0.3 AS q
            FROM documents
        )
    )
    GROUP BY bin
    ORDER BY bin
    """,
    description=(
        "Quality decile binning (ntile window over the quality score) — "
        "the curriculum/mixing bin assignment: per-bin doc counts and "
        "score ranges"
    ),
    tags=("llm", "quality", "window", "binning"),
)
def quality_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mandoline_hbase_spark.operators import ranking, text as text_ops

    # The UNROUNDED quality score, inline (with_quality_scores rounds to 4;
    # ntile over the rounded value would tie-break differently than the
    # oracle). Deciles come from operators.ranking.with_global_ntile —
    # exact ntile semantics with a range shuffle + per-partition windows,
    # never the single-partition global window the oracle SQL uses.
    text_col = F.col("text")
    toks = F.greatest(
        F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(
            F.length(F.trim(text_col))
            - F.length(F.replace(F.trim(text_col), F.lit(" "), F.lit("")))
            + 1
        ),
        F.lit(1),
    )
    stop_ratio = F.regexp_count(text_col, F.lit(text_ops.LANG_PATTERNS["en"])) / toks
    symbol_ratio = F.length(F.regexp_replace(text_col, r"[a-zA-Z0-9\s]", "")) / F.greatest(
        F.length(text_col), F.lit(1)
    )
    q = (
        F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.4
        + (1.0 - symbol_ratio) * 0.3
        + F.least(F.length(text_col) / 500.0, F.lit(1.0)) * 0.3
    )
    scored = load_table(spark, sf_dir, "documents").select(
        "doc_id", q.alias("q")
    )
    binned = ranking.with_global_ntile(
        scored, 10, [F.desc("q"), F.asc("doc_id")], out_col="bin"
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.min("q"), 4).alias("min_q"),
            F.round(F.max("q"), 4).alias("max_q"),
        )
        .orderBy("bin")
    )


@register(
    "full_outer_customer_orders",
    oracle=r"""
        WITH c AS (
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
        ),
        o AS (
            SELECT o_custkey, count(*) AS n_orders
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY o_custkey
        )
        SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
               c.c_name,
               coalesce(o.n_orders, 0)::BIGINT AS n_orders,
               (c.c_custkey IS NULL) AS customer_missing,
               (o.o_custkey IS NULL) AS orders_missing
        FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
    description=(
        "FULL OUTER join with nulls on BOTH sides (rich customers vs "
        "finished-order counts) — completes the join-type surface next to "
        "the semi/anti/left/asof/range queries"
    ),
    tags=("relational", "join", "full_outer"),
)
def full_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_name")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return joined.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        F.col("c_name"),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
        F.col("c_custkey").isNull().alias("customer_missing"),
        F.col("o_custkey").isNull().alias("orders_missing"),
    )
