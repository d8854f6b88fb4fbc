"""Unit semantics for timeseries operators: LOCF gap fill, SCD2 runs."""

from __future__ import annotations

import datetime as dt

from mandoline_hbase_spark.operators import timeseries


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )


def test_gap_fill_flags_and_locf(spark):
    t = dt.datetime(2024, 3, 1, 12, 0)
    df = _events(
        spark,
        [
            (1, t, 7, 10.0),
            (2, t + dt.timedelta(days=0, hours=1), 7, 30.0),
            (3, t + dt.timedelta(days=3), 7, 5.0),
        ],
    )
    out = {r.day: r for r in timeseries.resample_gap_fill(df).collect()}
    assert sorted(out) == ["2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"]
    assert out["2024-03-01"].n_events == 2 and out["2024-03-01"].filled_max == 30.0
    assert out["2024-03-02"].is_gap and out["2024-03-02"].filled_max == 30.0  # LOCF
    assert out["2024-03-03"].is_gap
    assert not out["2024-03-04"].is_gap and out["2024-03-04"].filled_max == 5.0


def test_gap_fill_spans_are_per_key(spark):
    t = dt.datetime(2024, 3, 1)
    df = _events(spark, [(1, t, 1, 1.0), (2, t + dt.timedelta(days=9), 2, 2.0)])
    out = timeseries.resample_gap_fill(df).collect()
    # each user spans exactly its own single active day — no global grid
    assert len(out) == 2 and all(not r.is_gap for r in out)


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_scd2_collapses_runs_and_closes_intervals(spark):
    t = dt.datetime(2024, 3, 1)
    s = dt.timedelta(seconds=1)
    df = _typed(
        spark,
        [
            (1, t, 7, "free"),
            (2, t + s, 7, "free"),  # same state -> same interval
            (3, t + 2 * s, 7, "pro"),
            (4, t + 3 * s, 7, "free"),  # state can recur as a NEW interval
        ],
    )
    rows = sorted(timeseries.scd2_history(df).collect(), key=lambda r: r.valid_from)
    assert [r.state for r in rows] == ["free", "pro", "free"]
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert rows[2].valid_to is None and rows[2].is_current
    assert not rows[0].is_current and not rows[1].is_current


def test_scd2_tiebreak_on_equal_timestamps(spark):
    t = dt.datetime(2024, 3, 1)
    df = _typed(spark, [(2, t, 7, "b"), (1, t, 7, "a")])
    rows = sorted(timeseries.scd2_history(df).collect(), key=lambda r: (r.valid_from, r.state))
    # event_id orders the tie: a (id 1) precedes b (id 2)
    assert [r.state for r in rows] == ["a", "b"]
    assert rows[1].is_current and not rows[0].is_current


def test_trailing_window_boundary_inclusive(spark):
    t = dt.datetime(2024, 3, 10)
    df = _events(
        spark,
        [
            (1, t - dt.timedelta(days=7), 7, 1.0),   # exactly 7d back: IN frame
            (2, t - dt.timedelta(days=7, microseconds=1), 7, 9.0),  # out
            (3, t, 7, 2.0),
        ],
    )
    out = {r.event_id: r for r in timeseries.trailing_window_stats(df, days=7).collect()}
    assert out[3].n_7d == 2 and out[3].max_7d == 2.0
    assert out[1].n_7d == 2  # event 2 is 1 microsecond earlier, in ITS frame
    assert out[2].n_7d == 1


def test_value_histogram_bins_negative_and_boundary(spark):
    rows = [(1, dt.datetime(2024, 1, 1), 7, v) for v in (-0.5, 0.0, 9.99, 10.0, 25.0)]
    df = _events(spark, [(i, *r[1:]) for i, r in enumerate(rows)])
    hist = timeseries.value_histogram(df, bin_width=10.0, group_col="user_id").collect()
    bins = {r.bin: r.n for r in hist}
    assert bins == {-1: 1, 0: 2, 1: 1, 2: 1}  # floor semantics: -0.5 -> -1, 10.0 -> 1
