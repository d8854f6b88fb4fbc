"""Bucketed materialization: the write-once-join-shuffle-free contract."""

from __future__ import annotations

import pytest

from mandoline_hbase_spark.operators import bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force real join strategies so an Exchange can't hide behind a
    broadcast for these small fixtures."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(no_broadcast, spark):
    a = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "va", (2 * __import__("pyspark").sql.functions.col("k")).cast("bigint")
    )
    b = spark.range(0, 500).withColumnRenamed("id", "k").withColumn(
        "vb", (3 * __import__("pyspark").sql.functions.col("k")).cast("bigint")
    )
    bucketed.materialize_bucketed(a, "t_bucket_a", ["k"], 4)
    bucketed.materialize_bucketed(b, "t_bucket_b", ["k"], 4)
    joined = bucketed.bucketed_equi_join(spark, "t_bucket_a", "t_bucket_b", ["k"])
    assert bucketed.exchange_count(joined) == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert joined.count() == 500
    # the same join on the UNbucketed frames shuffles both sides
    assert bucketed.exchange_count(a.join(b, "k")) >= 2


def test_bucketed_scan_selected_one_file_per_bucket(no_broadcast, spark):
    """The write path produces exactly one file per bucket (repartition
    before bucketBy) and the join planner consumes the bucketed layout.
    Note: Spark's v1 planner does NOT consume sortBy order (the merge
    join re-sorts within buckets); sortBy remains worthwhile for
    columnar compression and parquet min/max locality."""
    import glob

    a = spark.range(0, 300).withColumnRenamed("id", "k")
    b = spark.range(0, 300).withColumnRenamed("id", "k")
    bucketed.materialize_bucketed(a, "t_sorted_a", ["k"], 2)
    bucketed.materialize_bucketed(b, "t_sorted_b", ["k"], 2)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_sorted_a", "t_sorted_b"):
        assert len(glob.glob(f"{wh}/{t}/part-*.parquet")) == 2
    joined = bucketed.bucketed_equi_join(spark, "t_sorted_a", "t_sorted_b", ["k"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan and "SelectedBucketsCount: 2 out of 2" in plan
    assert bucketed.exchange_count(joined) == 0


def test_mismatched_buckets_fall_back_visibly(no_broadcast, spark):
    a = spark.range(0, 100).withColumnRenamed("id", "k")
    b = spark.range(0, 100).withColumnRenamed("id", "k")
    bucketed.materialize_bucketed(a, "t_mis_a", ["k"], 2)
    bucketed.materialize_bucketed(b, "t_mis_b", ["k"], 3)
    joined = bucketed.bucketed_equi_join(spark, "t_mis_a", "t_mis_b", ["k"])
    # exchange_count exposes the silent shuffle fallback Spark inserts
    assert bucketed.exchange_count(joined) >= 1
    assert joined.count() == 100


def test_bucketed_rewrite_replaces(spark):
    a = spark.range(0, 10).withColumnRenamed("id", "k")
    bucketed.materialize_bucketed(a, "t_replace", ["k"], 2)
    again = bucketed.materialize_bucketed(a.filter("k < 5"), "t_replace", ["k"], 2)
    assert again.count() == 5
    spark.sql("DROP TABLE IF EXISTS t_replace")


def test_bucketed_validation(spark):
    a = spark.range(0, 10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        bucketed.materialize_bucketed(a, "t_bad", ["nope"], 2)
    with pytest.raises(ValueError):
        bucketed.materialize_bucketed(a, "t_bad", ["k"], 0)


def test_bucketed_postings_join_shuffle_free(no_broadcast, spark):
    """The search-index materialization story end-to-end: postings and
    doc-length tables written co-bucketed on doc_id join with zero
    Exchange — the repeated-join workload bucketing exists for."""
    from mandoline_hbase_spark.operators import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tf, dl = search.postings(docs)
    bucketed.materialize_bucketed(tf, "t_postings_tf", ["doc_id"], 4)
    bucketed.materialize_bucketed(dl, "t_postings_dl", ["doc_id"], 4)
    joined = bucketed.bucketed_equi_join(spark, "t_postings_tf", "t_postings_dl", ["doc_id"])
    assert bucketed.exchange_count(joined) == 0
    # the join is still correct: every tf row finds its doc length
    assert joined.count() == tf.count()
    assert joined.filter("dl is null").count() == 0
    for t in ("t_postings_tf", "t_postings_dl"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_qualified_rewrite_never_touches_default_tables(spark):
    """A db-qualified rewrite must not clean up (delete!) the
    same-named default-database table's managed location."""
    import glob

    victim = spark.range(0, 7).withColumnRenamed("id", "k")
    bucketed.materialize_bucketed(victim, "t_victim", ["k"], 2)
    spark.sql("CREATE DATABASE IF NOT EXISTS otherdb")
    other = spark.range(0, 3).withColumnRenamed("id", "k")
    bucketed.materialize_bucketed(other, "otherdb.t_victim", ["k"], 2)
    # both tables intact, both locations distinct
    assert spark.table("t_victim").count() == 7
    assert spark.table("otherdb.t_victim").count() == 3
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert glob.glob(f"{wh}/t_victim/part-*.parquet")
    assert glob.glob(f"{wh}/otherdb.db/t_victim/part-*.parquet")
    spark.sql("DROP TABLE IF EXISTS t_victim")
    spark.sql("DROP TABLE IF EXISTS otherdb.t_victim")
    spark.sql("DROP DATABASE IF EXISTS otherdb")


def test_bm25_served_from_cobucketed_index_zero_exchange(no_broadcast, spark):
    """The served-search path END TO END: with tf/dl co-bucketed on
    doc_id, the ENTIRE bm25_topk_from_postings plan contains zero
    hash/range Exchange — the doc-keyed join and the per-doc score fold
    both reuse the bucket layout, df(t) and the corpus scalars are
    single-row aggregates that broadcast back. Results are identical to
    the unbucketed form."""
    from mandoline_hbase_spark.operators import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tf, dl = search.postings(docs)
    terms = ["data", "the", "model"]
    want = [tuple(r) for r in
            search.bm25_topk_from_postings(tf, dl, terms, k=10).collect()]
    bucketed.materialize_bucketed(tf, "t_bm25_tf", ["doc_id"], 4)
    bucketed.materialize_bucketed(dl, "t_bm25_dl", ["doc_id"], 4)
    try:
        served = search.bm25_topk_from_postings(
            spark.table("t_bm25_tf"), spark.table("t_bm25_dl"), terms, k=10
        )
        assert bucketed.exchange_count(served) == 0
        assert [tuple(r) for r in served.collect()] == want and want
    finally:
        for t in ("t_bm25_tf", "t_bm25_dl"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
