"""Relational query catalog over the TPC-H-ish corpus.

Spark-first: every query is a declarative DataFrame plan — Catalyst does
predicate pushdown, column pruning, join selection (broadcast for the small
dimension tables), and partial aggregation. Oracle SQL strings are ANSI SQL
for DuckDB.

Float discipline for the hash-compare: double-sum aggregates are rounded
(``round(x, 2)`` money, ``round(x, 4)`` averages/ratios) identically on both
sides so that summation-order differences between engines cannot flip the
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mandoline_hbase_spark.queries.catalog import register
from mandoline_hbase_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1: wide multi-aggregate groupBy.
# Scale notes: map-side partial aggregation keeps the shuffle at
# |groups| * |partitions| rows; no join. This is pure whole-stage-codegen.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 2)                                          AS sum_qty,
            round(sum(l_extendedprice), 2)                                     AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
            round(avg(l_quantity), 4)                                          AS avg_qty,
            round(avg(l_extendedprice), 4)                                     AS avg_price,
            round(avg(l_discount), 4)                                          AS avg_disc,
            count(*)                                                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary report (multi-agg groupBy)",
    tags=("tpch", "aggregate"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q3_shipping_priority — TPC-H Q3: 3-way join + agg + deterministic top-k.
# Scale notes: customer/orders filters push to the scans; AQE picks
# broadcast for the filtered customer side; top-k plans as
# TakeOrderedAndProject (no global sort materialization).
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
        SELECT
            l_orderkey,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            o_orderdate,
            o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3 shipping priority (join + agg + top-k)",
    tags=("tpch", "join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5_local_supplier_volume — TPC-H Q5: 6-way join through the dimension
# snowflake. region/nation are tiny -> broadcast joins; the lineitem-orders
# join shuffles on orderkey only.
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT
            n_name,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    description="TPC-H Q5 local supplier volume (6-way snowflake join)",
    tags=("tpch", "join"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6: pure filter + single aggregate. The whole
# query is one codegen'd scan stage; predicates push into parquet row-group
# stats.
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    description="TPC-H Q6 forecast revenue change (filter + scalar agg)",
    tags=("tpch", "filter", "aggregate"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q4_order_priority — TPC-H Q4 shape: EXISTS -> left-semi join, then count
# per priority. Spark plans the semi join without materializing lineitem
# columns.
# --------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 order priority checking (EXISTS / semi join)",
    tags=("tpch", "semijoin"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10 shape: returned-flag revenue per customer.
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
        SELECT
            c_custkey,
            c_name,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            round(c_acctbal, 2) AS acctbal,
            n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    description="TPC-H Q10 returned item reporting (join + agg + top-k)",
    tags=("tpch", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q14_promo_revenue — TPC-H Q14 shape: conditional aggregate over a join.
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
        SELECT round(
            100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                             THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    description="TPC-H Q14 promotion effect (conditional agg over join)",
    tags=("tpch", "join", "aggregate"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(disc_price), 4).alias("promo_revenue"))
    )


# --------------------------------------------------------------------------
# q18_large_volume_customers — TPC-H Q18 shape: HAVING over a grouped join.
# --------------------------------------------------------------------------
@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT
            c_custkey,
            c_name,
            o_orderkey,
            o_orderdate,
            round(o_totalprice, 2) AS totalprice,
            round(sum(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        HAVING sum(l_quantity) > 150
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 100
    """,
    description="TPC-H Q18 large volume customers (HAVING + top-k)",
    tags=("tpch", "join", "having"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("_sum_qty_raw"))
        .filter(F.col("_sum_qty_raw") > 150)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.col("_sum_qty_raw"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# anti_customers_without_orders — NOT EXISTS -> left-anti join (set
# difference on keys). The reference's only set op is distinct
# (hbase.clj:330); anti/semi come free with Spark. Restricted to urgent
# orders so the result is non-empty at every test SF (every customer has
# *some* order in the synthetic data; a 0-row result would make the
# correctness row vacuous).
# --------------------------------------------------------------------------
@register(
    "anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    description="Customers with no urgent orders (anti join / NOT EXISTS)",
    tags=("join", "antijoin"),
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# window_top3_suppliers_per_nation — top-k per group. This is the exact
# plan shape of find-index's latest-version resolution (SURVEY §2 #16):
# Window.partitionBy(key).orderBy(desc(rank)) + row_number <= k.
# --------------------------------------------------------------------------
@register(
    "window_top3_suppliers_per_nation",
    oracle="""
        SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal, rn
        FROM (
            SELECT n_name, s_suppkey, s_name, s_acctbal,
                   row_number() OVER (PARTITION BY n_name
                                      ORDER BY s_acctbal DESC, s_suppkey) AS rn
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
        )
        WHERE rn <= 3
    """,
    description="Top-3 suppliers per nation (windowed top-k per group)",
    tags=("window", "topk"),
)
def window_top3_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"), "rn")
    )


# --------------------------------------------------------------------------
# window_running_revenue — running total per customer (frame-bounded window).
# --------------------------------------------------------------------------
@register(
    "window_running_revenue",
    oracle="""
        SELECT
            o_custkey,
            o_orderkey,
            o_orderdate,
            round(sum(o_totalprice) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders
    """,
    description="Per-customer running order total (frame-bounded window sum)",
    tags=("window",),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# --------------------------------------------------------------------------
# window_order_gaps — lag(): days between a customer's consecutive orders.
# --------------------------------------------------------------------------
@register(
    "window_order_gaps",
    oracle="""
        SELECT
            o_custkey,
            o_orderkey,
            date_diff('day',
                      lag(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS days_since_prev
        FROM orders
    """,
    description="Days between consecutive orders per customer (lag window)",
    tags=("window",),
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("bigint")
        .alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# version_resolve_asof — THE reference query: find-index latest-<=-bound
# resolution (hbase.clj:184-198) re-expressed relationally. For each
# user_id, the latest event at-or-before the snapshot bound — exact-match-
# else-max semantics of an MVCC snapshot read. At scale: partition
# pruning on the bound + one window over the natural key.
# --------------------------------------------------------------------------
@register(
    "version_resolve_asof",
    oracle="""
        SELECT user_id, event_id, ts, event_type, round(value, 2) AS value
        FROM (
            SELECT user_id, event_id, ts, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts <= TIMESTAMP '2024-01-03 00:00:00'
        )
        WHERE rn = 1
    """,
    description="Latest event per user at a snapshot bound (find-index semantics, hbase.clj:184-198)",
    tags=("storage-analog", "window", "asof"),
)
def version_resolve_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", F.round("value", 2).alias("value"))
    )


# --------------------------------------------------------------------------
# topk_latest_events — versions-listing semantics (hbase.clj:283-297):
# newest-first + limit, explicit sort replacing storage key order.
# --------------------------------------------------------------------------
@register(
    "topk_latest_events",
    oracle="""
        SELECT event_id, ts, user_id, event_type
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 10
    """,
    description="Newest-first limited listing (Connection.versions semantics, hbase.clj:283-297)",
    tags=("storage-analog", "topk"),
)
def topk_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.orderBy(F.desc("ts"), F.desc("event_id"))
        .select("event_id", "ts", "user_id", "event_type")
        .limit(10)
    )


# --------------------------------------------------------------------------
# point_get_event — point get by key (get-metadata/read-a-chunk semantics,
# hbase.clj:70-80, 97-103): equality predicate + projection; Catalyst turns
# it into a pruned scan.
# --------------------------------------------------------------------------
@register(
    "point_get_event",
    oracle="""
        SELECT event_id, ts, event_type, round(value, 2) AS value
        FROM events WHERE event_id = 42
    """,
    description="Point get by key with projection (hbase.clj:70-80)",
    tags=("storage-analog", "pointget"),
)
def point_get_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") == 42).select(
        "event_id", "ts", "event_type", F.round("value", 2).alias("value")
    )


# --------------------------------------------------------------------------
# range_scan_events — bounded range scan + projection (find-index's
# start/stop-row bounding, hbase.clj:191-192).
# --------------------------------------------------------------------------
@register(
    "range_scan_events",
    oracle="""
        SELECT event_id, ts, user_id, event_type
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
          AND ts <  TIMESTAMP '2024-01-03 00:00:00'
    """,
    description="Bounded range scan with projection (hbase.clj:191-192)",
    tags=("storage-analog", "rangescan"),
)
def range_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "user_id", "event_type")


# --------------------------------------------------------------------------
# prefix_scan_parts — prefix filter + distinct (list-datasets semantics,
# hbase.clj:318-330: filter on prefix, strip, distinct).
# --------------------------------------------------------------------------
@register(
    "prefix_scan_parts",
    oracle="""
        SELECT DISTINCT p_brand
        FROM part
        WHERE p_name LIKE 'small%'
        ORDER BY p_brand
    """,
    description="Prefix filter + distinct (Schema.list-datasets, hbase.clj:318-330)",
    tags=("storage-analog", "filter", "distinct"),
)
def prefix_scan_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").startswith("small"))
        .select("p_brand")
        .distinct()
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# rollup_revenue — ROLLUP grouping sets (beyond the reference; built-in).
# --------------------------------------------------------------------------
@register(
    "rollup_revenue",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="Hierarchical subtotals via ROLLUP",
    tags=("aggregate", "rollup"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


# --------------------------------------------------------------------------
# cube_segment_status — CUBE grouping sets.
# --------------------------------------------------------------------------
@register(
    "cube_segment_status",
    oracle="""
        SELECT c_mktsegment, o_orderstatus,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY CUBE (c_mktsegment, o_orderstatus)
        ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    description="All grouping-set combinations via CUBE",
    tags=("aggregate", "cube"),
)
def cube_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(F.asc_nulls_first("c_mktsegment"), F.asc_nulls_first("o_orderstatus"))
    )


# --------------------------------------------------------------------------
# set_ops_customer_cohorts — UNION/INTERSECT/EXCEPT on key sets.
# --------------------------------------------------------------------------
@register(
    "set_ops_customer_cohorts",
    oracle="""
        WITH h1 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        ),
        h2 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        )
        SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
        UNION ALL
        SELECT o_custkey, 'h1_only' AS cohort FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
        UNION ALL
        SELECT o_custkey, 'h2_only' AS cohort FROM (SELECT * FROM h2 EXCEPT SELECT * FROM h1)
    """,
    description="Customer cohorts via INTERSECT / EXCEPT / UNION ALL",
    tags=("setops",),
)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h1 = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .select("o_custkey")
        .distinct()
    )
    h2 = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_custkey")
        .distinct()
    )
    both = h1.intersect(h2).withColumn("cohort", F.lit("both"))
    h1_only = h1.exceptAll(h2).withColumn("cohort", F.lit("h1_only"))
    h2_only = h2.exceptAll(h1).withColumn("cohort", F.lit("h2_only"))
    return both.unionAll(h1_only).unionAll(h2_only)


# --------------------------------------------------------------------------
# scalar_functions_events — the reference's scalar-function surface
# (SURVEY §2.2): string join/split, millis->timestamp, JSON parse, casts.
# --------------------------------------------------------------------------
@register(
    "scalar_functions_events",
    oracle="""
        SELECT
            event_id,
            upper(event_type) AS type_upper,
            concat_ws('|', event_type, CAST(user_id AS VARCHAR)) AS packed_key,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
            CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
            CAST(hour(ts) AS BIGINT) AS hour_of_day,
            round(value * 1.1, 3) AS value_taxed
        FROM events
        WHERE event_id < 200
    """,
    description="Scalar function surface: string/JSON/timestamp/math (SURVEY §2.2)",
    tags=("scalar", "json"),
)
def scalar_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return events.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.concat_ws("|", F.col("event_type"), F.col("user_id").cast("string")).alias("packed_key"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.hour("ts").cast("bigint").alias("hour_of_day"),
        F.round(F.col("value") * 1.1, 3).alias("value_taxed"),
    )


# --------------------------------------------------------------------------
# coordinate_key_codec — coordinate->id / coordinate->key round trip
# (hbase.clj:176-182): pack components with separators, recover them.
# --------------------------------------------------------------------------
@register(
    "coordinate_key_codec",
    oracle="""
        SELECT
            concat_ws('|', 'lineitem',
                      concat_ws('/', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR)),
                      '1994') AS row_key,
            CAST(string_split(concat_ws('/', CAST(l_orderkey AS VARCHAR),
                                        CAST(l_linenumber AS VARCHAR)), '/')[1] AS BIGINT) AS recovered_orderkey
        FROM lineitem
        WHERE l_orderkey < 100
    """,
    description="Composite row-key pack/unpack (coordinate->key, hbase.clj:176-182)",
    tags=("storage-analog", "scalar"),
)
def coordinate_key_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    coord_id = F.concat_ws(
        "/", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return lineitem.select(
        F.concat_ws("|", F.lit("lineitem"), coord_id, F.lit("1994")).alias("row_key"),
        F.element_at(F.split(coord_id, "/"), 1).cast("bigint").alias("recovered_orderkey"),
    )


# --------------------------------------------------------------------------
# agg_stats_per_nation — multi-stat profile incl. distinct counts.
# --------------------------------------------------------------------------
@register(
    "agg_stats_per_nation",
    oracle="""
        SELECT
            n_name,
            count(*) AS n_customers,
            count(DISTINCT c_mktsegment) AS n_segments,
            round(avg(c_acctbal), 4) AS avg_bal,
            round(min(c_acctbal), 2) AS min_bal,
            round(max(c_acctbal), 2) AS max_bal,
            round(stddev_samp(c_acctbal), 4) AS sd_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    description="Grouped statistical profile (count/distinct/avg/min/max/stddev)",
    tags=("aggregate", "stats"),
)
def agg_stats_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        )
        .orderBy("n_name")
    )
