"""TPC-H completion: Q2, Q11, Q20, Q21 adapted to the fixture schema.

The fixture lacks ``partsupp`` (FIXTURES.md §B), so the three queries that
center on it (Q2, Q11, Q20) derive the part↔supplier relationship from
``lineitem`` instead — unit cost proxied by ``min(l_extendedprice /
l_quantity)`` per (part, supplier) — while keeping each query's structural
challenge intact:

- Q2  — correlated minimum (min-cost supplier per part) + 4-way dim join
- Q11 — group HAVING against a global scalar aggregate
- Q20 — nested aggregate subquery feeding a semi join
- Q21 — EXISTS / NOT EXISTS self-joins (left-semi + left-anti in Spark)

Q21 replaces the missing ``l_receiptdate``/``l_commitdate`` with a
"late = shipped more than 60 days after the order date" predicate.

All double comparisons join on values propagated from order-independent
aggregates (``min``), or compare sums against a scalar fraction where a
boundary flip would need the two engines' sums to differ by ~1e-12
relative — far below any realistic divergence.

With these, the catalog covers all 22 TPC-H query structures (the rest
live in relational.py / relational_ext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mandoline_hbase_spark.queries.catalog import register
from mandoline_hbase_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# q2_min_cost_supplier — TPC-H Q2 adapted. The correlated scalar subquery
# ("supplier whose cost equals the minimum for that part in that region")
# becomes a window-min over the part key: ONE shuffle on l_partkey, every
# dimension (part/supplier/nation/region) broadcast. The min-cost join key
# is exact (min propagates identical doubles), so the equality predicate is
# deterministic across engines.
# --------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ),
        best AS (
            SELECT l_partkey AS b_partkey, min(unit_cost) AS best_cost
            FROM cost
            GROUP BY l_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
        FROM cost
        JOIN best ON l_partkey = b_partkey AND unit_cost = best_cost
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size <= 15 AND r_name = 'EUROPE'
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    description="TPC-H Q2 adapted: min-cost supplier per small part in EUROPE",
    tags=("tpch", "join", "window", "correlated"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    cost = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    dims = (
        F.broadcast(nation)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    return (
        best.join(
            F.broadcast(part.filter(F.col("p_size") <= 15)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q11_important_parts — TPC-H Q11 adapted. The HAVING-against-global-sum
# becomes per-part aggregation (one shuffle) + a scalar total derived from
# the SAME per-part aggregate (agg-of-agg, tiny), cross-joined as a
# broadcast literal — no second scan of lineitem and no single-partition
# window collapse at scale.
# --------------------------------------------------------------------------
@register(
    "q11_important_parts",
    oracle="""
        WITH nation_lines AS (
            SELECT l_partkey, l_extendedprice
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
        )
        SELECT l_partkey AS partkey,
               round(sum(l_extendedprice), 2) AS part_value
        FROM nation_lines
        GROUP BY l_partkey
        HAVING sum(l_extendedprice) >
               (SELECT 0.001 * sum(l_extendedprice) FROM nation_lines)
        ORDER BY part_value DESC, partkey
    """,
    description="TPC-H Q11 adapted: parts above 0.1% of one nation's line value",
    tags=("tpch", "aggregate", "scalar-subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    nation_lines = (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("l_partkey", "l_extendedprice")
    )
    per_part = nation_lines.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("value_raw")
    )
    total = per_part.agg((F.sum("value_raw") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_raw") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("value_raw", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


# --------------------------------------------------------------------------
# q20_part_promotion — TPC-H Q20 adapted. The nested aggregate subquery
# ("suppliers holding a dominant share of a part's recent shipments")
# becomes per-(supplier, part) aggregation + window part-total + a
# left-semi join selecting the qualifying suppliers. One shuffle on
# l_partkey; the qualifying-supplier set joins back semi-style.
# --------------------------------------------------------------------------
@register(
    "q20_part_promotion",
    oracle="""
        WITH shipped AS (
            SELECT l_suppkey, l_partkey, sum(l_quantity) AS supp_qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%gear%'
              AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
        ),
        dominant AS (
            SELECT DISTINCT l_suppkey
            FROM (
                SELECT l_suppkey, supp_qty,
                       sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
                FROM shipped
            )
            WHERE supp_qty > 0.3 * part_qty
        )
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
        ORDER BY s_name
    """,
    description="TPC-H Q20 adapted: suppliers dominating recent gear-part shipments",
    tags=("tpch", "semi-join", "window", "nested-aggregate"),
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    shipped = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%gear%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# q21_waiting_suppliers — TPC-H Q21 adapted. EXISTS → left-semi self-join,
# NOT EXISTS → left-anti self-join, both shuffling on l_orderkey only.
# "Late" is shipped >60 days after the order date (the fixture has no
# receipt/commit dates). Counts late lines on finished multi-supplier
# orders where this supplier was the ONLY late one.
# --------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1
              FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    description="TPC-H Q21 adapted: sole-late suppliers on finished multi-supplier orders",
    tags=("tpch", "semi-join", "anti-join", "self-join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        lineitem.join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    all_lines = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    multi = late.join(
        all_lines,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole_late = multi.join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
