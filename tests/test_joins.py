"""Unit tests for the as-of and range join operators."""

from __future__ import annotations

import datetime as dt


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    from mandoline_hbase_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),  # no prior right row
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30:00"), 100.0),
            ("u1", _ts("2024-01-01T11:00:00"), 200.0),
            ("u2", _ts("2024-01-01T09:30:00"), 300.0),  # after left's only row
        ],
        "user string, ts timestamp, px double",
    )
    out = {
        r.event_id: r.px
        for r in asof_join(left, right, on="ts", by="user", right_cols=["px"]).collect()
    }
    assert out == {1: 100.0, 2: 200.0, 3: None}


def test_asof_join_exact_match_toggle(spark):
    from mandoline_hbase_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:00:00"))], "event_id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T10:00:00"), 1.0),
            ("u", _ts("2024-01-01T09:00:00"), 2.0),
        ],
        "user string, ts timestamp, px double",
    )
    exact = asof_join(left, right, on="ts", by="user", right_cols=["px"]).collect()
    assert exact[0].px == 1.0  # equal timestamp visible
    strict = asof_join(
        left, right, on="ts", by="user", right_cols=["px"], allow_exact_matches=False
    ).collect()
    assert strict[0].px == 2.0  # equal timestamp excluded -> prior row


def test_asof_join_single_shuffle_plan(spark):
    """The merge as-of must not plan a range/theta join: no
    BroadcastNestedLoopJoin or CartesianProduct anywhere in the plan."""
    from mandoline_hbase_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:00:00"))], "event_id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01T09:00:00"), 1.0)], "user string, ts timestamp, px double"
    )
    plan = (
        asof_join(left, right, on="ts", by="user", right_cols=["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Union" in plan and "Window" in plan


def test_range_join_bounds(spark):
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:00:00"))], "id long, user string, t0 timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T10:30:00"), "in"),
            ("u", _ts("2024-01-01T11:30:00"), "out-late"),
            ("u", _ts("2024-01-01T09:59:00"), "out-early"),
        ],
        "user string, t1 timestamp, tag string",
    )
    got = range_join(
        left,
        right,
        by="user",
        left_ts="t0",
        right_ts="t1",
        lower=F.expr("INTERVAL 0 SECONDS"),
        upper=F.expr("INTERVAL 1 HOUR"),
    ).collect()
    assert [r.tag for r in got] == ["in"]
