"""Python UDTF surface: partition-ordered iteration semantics pinned
against the JVM window-based sessionization."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mandoline_hbase_spark.functions.udtfs import register_udtfs
from mandoline_hbase_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

GAP = 1800


def _expected_sessions(events):
    """JVM reference: lag-gap flag + running sum per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > GAP), 1).otherwise(0)
    return (
        events.withColumn("_new", new_sess)
        .withColumn("session_seq", F.sum("_new").over(w).cast("int"))
        .select("user_id", "event_id", "session_seq")
    )


def test_sessionize_udtf_matches_window_sessionization(spark):
    register_udtfs(spark)
    events = load_table(spark, SF_SMOKE, "events")
    events.createOrReplaceTempView("events")
    got = spark.sql(
        f"""
        SELECT * FROM sessionize_udtf(
            TABLE(events) PARTITION BY user_id ORDER BY (ts, event_id),
            {GAP}
        )
        """
    )
    expected = _expected_sessions(events)
    assert got.count() == events.count()
    diff = got.exceptAll(expected)
    assert diff.count() == 0, diff.limit(5).collect()


def test_sessionize_udtf_partition_isolation(spark):
    """Two users with interleaved timestamps: sessions never bleed
    across partition keys."""
    register_udtfs(spark)
    rows = [
        (1, "2024-01-01 00:00:00", 10),
        (2, "2024-01-01 00:00:10", 20),
        (1, "2024-01-01 02:00:00", 11),   # > gap -> user 1 session 2
        (2, "2024-01-01 00:10:00", 21),   # <= gap -> user 2 session 1
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts_s STRING, event_id BIGINT").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id"
    )
    df.createOrReplaceTempView("udtf_iso_events")
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in spark.sql(
            f"""SELECT * FROM sessionize_udtf(
                TABLE(udtf_iso_events) PARTITION BY user_id ORDER BY (ts, event_id),
                {GAP})"""
        ).collect()
    }
    assert got == {(1, 10): 1, (1, 11): 2, (2, 20): 1, (2, 21): 1}
