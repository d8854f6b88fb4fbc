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
