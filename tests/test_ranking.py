"""Distributed global ranking (operators.ranking) vs the exact window
functions it replaces: identical output, no single-partition window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from mandoline_hbase_spark.operators import ranking


def _df(spark, n, parts=7):
    # non-monotone values with duplicate keys; id is the total-order tiebreak
    return spark.range(n).repartition(parts).select(
        F.col("id"), ((F.col("id") * 37) % 11).alias("v")
    )


@pytest.mark.parametrize("n", [0, 1, 9, 10, 11, 97, 1000])
def test_global_row_number_matches_window(spark, n):
    df = _df(spark, n)
    got = {
        (r.id, r.rn)
        for r in ranking.with_global_row_number(
            df, [F.desc("v"), F.asc("id")], "rn"
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r.id, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w).cast("bigint")).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(1, 10), (9, 10), (10, 10), (11, 10), (97, 10), (1000, 4)])
def test_global_ntile_matches_window(spark, n, k):
    df = _df(spark, n)
    got = {
        (r.id, r.bin)
        for r in ranking.with_global_ntile(
            df, k, [F.desc("v"), F.asc("id")], "bin"
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r.id, r.bin)
        for r in df.withColumn("bin", F.ntile(k).over(w).cast("bigint")).collect()
    }
    assert got == want


def test_no_single_partition_window_in_plan(spark):
    df = ranking.with_global_ntile(_df(spark, 500), 10, [F.desc("v"), F.asc("id")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_ntile_from_rank_column_matches_sql_ntile(spark):
    """The closed-form column expression equals Spark's own ntile window
    over every rank, across awkward (n, k) shapes (n < k, n % k != 0,
    k = 1). One generated rank table per shape, evaluated for real."""
    for n, k in [(1, 1), (1, 7), (6, 7), (7, 7), (8, 7), (29, 5), (100, 13), (500, 16)]:
        ranks = spark.range(1, n + 1).select(F.col("id").alias("rn"))
        got = {
            r.rn: r.bin
            for r in ranks.select(
                "rn", ranking.ntile_from_rank(F.col("rn"), n, k).alias("bin")
            ).collect()
        }
        w = Window.orderBy("rn")
        want = {
            r.rn: r.bin
            for r in ranks.withColumn("bin", F.ntile(k).over(w).cast("bigint")).collect()
        }
        assert got == want, (n, k)
