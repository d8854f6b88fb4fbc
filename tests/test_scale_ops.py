"""Scale-machinery tests: salted joins, partition pruning, bucketed joins."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    from mandoline_hbase_spark.operators.skew import salted_join

    # skewed left: 90% of rows share key 0
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = left.join(right, "k").select("k", "payload", "dim")
    salted = salted_join(left, right, "k").select("k", "payload", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    from mandoline_hbase_spark.operators.skew import salted_join

    left = spark.range(1000).select(F.lit(0).alias("k"), F.col("id").alias("payload"))
    right = spark.range(1).select(F.col("id").alias("k"), F.lit("x").alias("dim"))
    out = salted_join(left, right, "k", n_salts=8)
    assert out.count() == 1000
    # the hot key's rows occupy >1 shuffle partition post-join
    parts = (
        out.withColumn("p", F.spark_partition_id()).select("p").distinct().count()
    )
    assert parts > 1


def test_partition_pruning_skips_directories(spark, tmp_path):
    from mandoline_hbase_spark.sources.lake import read_partitioned, write_partitioned
    from mandoline_hbase_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, ["o_year"])

    filtered = read_partitioned(spark, path).filter(F.col("o_year") == 1996)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan and "(o_year" in plan
    expected = orders.filter(F.col("o_year") == 1996).count()
    assert filtered.count() == expected


def test_bucketed_join_avoids_shuffle(spark):
    from mandoline_hbase_spark.sources.lake import write_bucketed_table
    from mandoline_hbase_spark.sources.tables import load_table

    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "orders"), t_orders, ["o_orderkey"], 4
    )
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "lineitem"), t_lineitem, ["l_orderkey"], 4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: at this toy size Spark would
        # (rightly) broadcast, which needs a BroadcastExchange and hides
        # the property under test — that identically-bucketed tables
        # sort-merge-join with NO shuffle Exchange on either side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table(t_orders)
            .join(
                spark.table(t_lineitem),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_approx_distinct_within_5pct_of_exact(spark):
    from mandoline_hbase_spark.queries.catalog import QUERIES

    exact = {
        r.event_type: r.n_users
        for r in QUERIES["distinct_users_by_type"].fn(spark, SF_SMOKE).collect()
    }
    got = {r.event_type: r for r in QUERIES["approx_distinct_users"].fn(spark, SF_SMOKE).collect()}
    assert set(exact) == set(got)
    for k in exact:
        # the query now carries the exact twin + the in-plan 5% claim
        assert got[k].n_users_exact == exact[k]
        assert got[k].approx_within_5pct is True


def test_pack_sequences_semantics(spark):
    from mandoline_hbase_spark.operators.packing import pack_sequences, pack_utilization

    # one bucket -> deterministic id-order greedy fill; tokens: 3,3,3,10,3
    rows = [
        (0, "a b c"),
        (1, "d e f"),
        (2, "g h i"),
        (3, " ".join("x" * 10)),
        (4, "j k l"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_sequences(df, budget=8, n_buckets=1)
    got = {r.doc_id: (r.n_tok, r.pack_seq) for r in packed.collect()}
    # prefix sums (exclusive): 0,3,6,9,19 -> packs 0,0,0,1,2
    assert got == {0: (3, 0), 1: (3, 0), 2: (3, 0), 3: (10, 1), 4: (3, 2)}

    util = {
        (r.bucket, r.pack_seq): (r.n_docs, r.pack_tokens)
        for r in pack_utilization(packed, budget=8).collect()
    }
    assert util == {(0, 0): (3, 9), (0, 1): (1, 10), (0, 2): (1, 3)}


def test_pack_sequences_rejects_bad_budget(spark):
    import pytest

    from mandoline_hbase_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_decontamination_overlap_broadcast(spark):
    from mandoline_hbase_spark.operators.dedup import decontamination_overlap

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps high today")], ["doc_id", "text"]
    )
    out = decontamination_overlap(corpus, ev, min_shared=2)
    rows = out.collect()
    # doc 1 shares 'the quick brown','quick brown fox','brown fox jumps'
    assert [(r.doc_id, r.eval_id, r.n_shared) for r in rows] == [(1, 100, 3)]
    # the eval side must be broadcast (no corpus-side shuffle for the join)
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_approx_percentiles_close_to_exact(spark):
    """The GK-sketch percentiles stay within 1% relative error of the
    exact interpolated percentiles at the oracle scale factor."""
    from mandoline_hbase_spark.queries.catalog import QUERIES

    from tests.conftest import SF_ORACLE

    exact = {
        r["c_mktsegment"]: (r["p50_price"], r["p90_price"])
        for r in QUERIES["percentiles_by_segment"].fn(spark, SF_ORACLE).collect()
    }
    got = {
        r["c_mktsegment"]: r
        for r in QUERIES["approx_percentiles_by_segment"].fn(spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(got)
    for seg in exact:
        # in-plan rank-error verification replaced the raw sketch values
        assert got[seg]["p50_rank_ok"] is True and got[seg]["p90_rank_ok"] is True


def test_hll_union_rollup_close_to_exact(spark):
    """The sketch-union global distinct stays within 2% of exact, and the
    union is computed from the per-group sketches alone (mergeability —
    the property that makes sketch tables rollup-able at 100 TB)."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.queries.catalog import QUERIES
    from mandoline_hbase_spark.sources.tables import load_table

    from tests.conftest import SF_ORACLE

    got = {
        r["event_type"]: r
        for r in QUERIES["hll_union_distinct_users"].fn(spark, SF_ORACLE).collect()
    }
    events = load_table(spark, SF_ORACLE, "events")
    exact_all = events.select("user_id").distinct().count()
    assert got["__all__"]["n_users_exact"] == exact_all
    assert got["__all__"]["sketch_within_5pct"] is True  # the UNION rollup claim
    exact_types = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for t, n in exact_types.items():
        assert got[t]["n_users_exact"] == n and got[t]["sketch_within_5pct"] is True
