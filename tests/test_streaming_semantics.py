"""Watermark semantics: stream dedup and late-data drop, fully controlled
synthetic timelines (no fixture dependence, deterministic watermarks)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events(rows):
    """rows: (event_id, iso_ts, user_id, type, value)"""
    return pd.DataFrame(
        {
            "event_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "ts": pd.Series(
                [dt.datetime.fromisoformat(r[1]) for r in rows], dtype="datetime64[us]"
            ),
            "user_id": pd.Series([r[2] for r in rows], dtype="int64"),
            "event_type": [r[3] for r in rows],
            "value": pd.Series([r[4] for r in rows], dtype="float64"),
            "props": ["{}" for _ in rows],
        }
    )


def _write_slice(dirpath, name, pdf):
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), dirpath / name)


def _run(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_stream_drops_replayed_events(spark, tmp_path):
    from mandoline_hbase_spark.streaming.ingest import dedup_stream, read_events_stream

    src = tmp_path / "in"
    src.mkdir()
    batch1 = _events(
        [
            (1, "2024-01-01T10:00:00", 1, "click", 1.0),
            (2, "2024-01-01T10:05:00", 1, "click", 2.0),
        ]
    )
    # batch 2 replays event 2 (same key, within watermark) + a new event
    batch2 = _events(
        [
            (2, "2024-01-01T10:05:00", 1, "click", 2.0),
            (3, "2024-01-01T10:10:00", 2, "view", 3.0),
        ]
    )
    _write_slice(src, "b1.parquet", batch1)
    _write_slice(src, "b2.parquet", batch2)

    stream = dedup_stream(read_events_stream(spark, str(src)), watermark="1 hour")
    _run(stream, "dedup_out", "append")
    got = spark.table("dedup_out").toPandas()
    assert sorted(got.event_id) == [1, 2, 3]


def test_windowed_append_drops_late_data(spark, tmp_path):
    """A row older than the watermark arriving after its window closed must
    not change the emitted result (the deterministic late-data policy)."""
    from mandoline_hbase_spark.streaming.ingest import (
        read_events_stream,
        windowed_event_counts,
    )

    import time

    src = tmp_path / "in"
    src.mkdir()
    # batch 0: two 10:xx clicks + a 20:00 event that advances the watermark
    # (20:00 - 2h = 18:00) far past the 10:00-11:00 window
    batch1 = _events(
        [
            (1, "2024-01-01T10:10:00", 1, "click", 1.0),
            (2, "2024-01-01T10:20:00", 1, "click", 1.0),
            (3, "2024-01-01T20:00:00", 1, "view", 1.0),
        ]
    )
    # batch 1: any on-time event — processing it emits + EVICTS the closed
    # 10:00 window (watermark semantics: "may drop" hardens to "drops" only
    # once the window state is gone)
    batch2 = _events([(4, "2024-01-01T20:05:00", 1, "view", 1.0)])
    # batch 2: a LATE click at 10:30 — behind the 18:00 watermark, state gone
    batch3 = _events([(5, "2024-01-01T10:30:00", 1, "click", 1.0)])
    _write_slice(src, "b1.parquet", batch1)
    time.sleep(1.1)  # distinct mtimes: the file source orders batches by them
    _write_slice(src, "b2.parquet", batch2)
    time.sleep(1.1)
    _write_slice(src, "b3.parquet", batch3)

    stream = windowed_event_counts(
        read_events_stream(spark, str(src)), window_duration="1 hour", watermark="2 hours"
    )
    _run(stream, "late_out", "append")
    got = spark.table("late_out").toPandas()
    ten = got[
        (got.event_type == "click")
        & (got.window_start == pd.Timestamp("2024-01-01T10:00:00"))
    ]
    # the 10:00 window was finalized with 2 clicks; the late event is gone
    assert len(ten) == 1
    assert int(ten.n_events.iloc[0]) == 2


@pytest.mark.parametrize("mode", ["complete"])
def test_complete_mode_keeps_late_data_visible(spark, tmp_path, mode):
    """Contrast case: complete mode re-emits full state, so data arriving
    while its window state is still live (not yet evicted) is counted."""
    from mandoline_hbase_spark.streaming.ingest import (
        read_events_stream,
        windowed_event_counts,
    )

    src = tmp_path / "in"
    src.mkdir()
    _write_slice(
        src, "b1.parquet", _events([(1, "2024-01-01T10:10:00", 1, "click", 1.0)])
    )
    _write_slice(
        src, "b2.parquet", _events([(2, "2024-01-01T10:20:00", 1, "click", 1.0)])
    )
    stream = windowed_event_counts(
        read_events_stream(spark, str(src)), window_duration="1 hour", watermark="2 hours"
    )
    _run(stream, "complete_out", mode)
    got = spark.table("complete_out").toPandas()
    clicks = got[got.event_type == "click"]
    assert int(clicks.n_events.sum()) == 2
