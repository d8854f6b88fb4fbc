"""Incremental materialized stats: full build, delta refresh, shrink."""

from __future__ import annotations

import numpy as np
import pytest

from mandoline_hbase_spark.errors import InvalidArgumentError
from mandoline_hbase_spark.materialized import IncrementalVarStats


def _expect(arr):
    return {
        "n": arr.size,
        "total": float(arr.sum()),
        "vmin": float(arr.min()),
        "vmax": float(arr.max()),
    }


def _close(got, want):
    assert got["n"] == want["n"]
    assert abs(got["total"] - want["total"]) < 1e-9
    assert got["vmin"] == want["vmin"] and got["vmax"] == want["vmax"]


def test_full_build_matches_numpy(store, tmp_path, spark):
    arr = np.arange(48, dtype=np.float64).reshape(6, 8)
    store.write_variable("v", arr, chunk_shape=(2, 3))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)
    out = m.refresh()
    assert out["incremental"] is False
    _close(m.totals(), _expect(arr))


def test_incremental_refresh_decodes_only_touched_chunks(store, tmp_path, spark):
    arr = np.arange(48, dtype=np.float64).reshape(6, 8)
    store.write_variable("v", arr, chunk_shape=(2, 3))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)
    m.refresh()

    # slab update touching chunks (0,0) and (0,1) only
    patch = np.full((2, 4), 999.0)
    store.update_region("v", patch, offset=(0, 0))
    arr[0:2, 0:4] = patch

    decoded = []
    orig = m._decode_stats

    def spy(joined, var_meta):
        decoded.append(joined.count())
        return orig(joined, var_meta)

    m._decode_stats = spy
    out = m.refresh()
    assert out["incremental"] is True
    # 6x8 with (2,3) chunks = 12 coords total; the slab intersects 2
    assert decoded == [2]
    _close(m.totals(), _expect(arr))


def test_refresh_same_version_is_noop(store, tmp_path, spark):
    store.write_variable("v", np.ones((4, 4)), chunk_shape=(2, 2))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)
    m.refresh()
    wm = m.watermark()
    out = m.refresh()
    assert m.watermark() == wm and out["stats_rows"] == 0


def test_shrink_drops_stale_coords(store, tmp_path, spark):
    store.write_variable("v", np.ones((6, 6)), chunk_shape=(2, 2))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)
    m.refresh()
    small = np.full((2, 2), 5.0)
    store.write_variable("v", small, chunk_shape=(2, 2))
    m.refresh()
    _close(m.totals(), _expect(small))


def test_backwards_refresh_rejected(store, tmp_path, spark):
    store.write_variable("v", np.ones((2, 2)), chunk_shape=(2, 2))
    v1 = store.latest_version_id()
    store.update_region("v", np.zeros((1, 1)), offset=(0, 0))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)
    m.refresh()
    with pytest.raises(InvalidArgumentError):
        m.refresh(version=v1)


def test_streaming_change_feed_keeps_totals_current(spark, store, tmp_path):
    """Streaming incremental view maintenance: the version-log change feed
    triggers a refresh per micro-batch, so the materialized totals track
    the store without any full rebuild."""
    from mandoline_hbase_spark.sources.datasource import register

    register(spark)
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    store.write_variable("v", arr, chunk_shape=(2, 2))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)

    def run_pass(ckpt):
        q = (
            spark.readStream.format("mandoline")
            .option("path", store.dataset_dir)
            .option("variable", "v")
            .option("form", "changes")
            .load()
            .writeStream.foreachBatch(lambda batch, bid: m.refresh())
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_pass("ckpt1")
    _close(m.totals(), _expect(arr))

    patch = np.full((2, 2), 50.0)
    store.update_region("v", patch, offset=(2, 2))
    arr[2:4, 2:4] = patch
    run_pass("ckpt2")
    _close(m.totals(), _expect(arr))


def test_refresh_catches_reserved_early_committed_late(spark, tmp_path):
    """The reservation protocol commits ids out of order: a job that
    reserved BEFORE the watermark version can commit AFTER it. The delta
    is keyed on the committed-version set, so those rows are decoded."""
    from mandoline_hbase_spark import storage
    from mandoline_hbase_spark.engine import mk_schema

    schema = mk_schema(
        {"root": "ooo.example.com", "base_path": str(tmp_path)}, spark=spark
    )
    schema.create_dataset("ds")
    conn = schema.connect("ds")
    arr = np.zeros((4, 4))
    conn.write_variable("v", arr, chunk_shape=(2, 2))
    m = IncrementalVarStats(conn, "v", str(tmp_path / "mat"), spark=spark)
    m.refresh()

    rid = conn._reserve_version()  # slow job claims its id early...
    try:
        conn.update_region("v", np.ones((2, 2)), offset=(0, 0))  # fast job lands
        arr[0:2, 0:2] = 1.0
        m.refresh()
        _close(m.totals(), _expect(arr))

        # ...and commits late, at an id BELOW the watermark version
        conn.update_region("v", np.full((2, 2), 7.0), offset=(2, 2), version_id=rid)
        arr[2:4, 2:4] = 7.0
        out = m.refresh()
        assert out["stats_rows"] == 1  # exactly the late commit's chunk
        _close(m.totals(), _expect(arr))
    finally:
        storage.release_version_reservation(conn._dirs["versions"], rid)


def test_torn_watermark_degrades_to_full_rebuild(spark, store, tmp_path):
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    store.write_variable("v", arr, chunk_shape=(2, 2))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)
    m.refresh()
    # simulate a crash mid-write of the state file
    with open(m._watermark_path, "w") as f:
        f.write('{"version": 12, "comm')
    assert m.watermark() is None  # unreadable == missing
    out = m.refresh()  # full rebuild, not a crash
    assert out["incremental"] is False
    _close(m.totals(), _expect(arr))


def test_missing_stats_dir_with_live_watermark_rebuilds(spark, store, tmp_path):
    """A crash between the old-state delete and the swap (or a manual
    delete) can leave a committed watermark with NO stats dir; an
    incremental refresh would then merge only the new delta and silently
    drop every previously materialized coord. The refresh must detect
    the torn state and rebuild from zero."""
    import shutil

    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    store.write_variable("v", arr, chunk_shape=(2, 2))
    m = IncrementalVarStats(store, "v", str(tmp_path / "mat"), spark=spark)
    m.refresh()
    shutil.rmtree(m._stats_dir)  # watermark survives, state is gone

    patch = np.full((2, 2), 500.0)
    store.update_region("v", patch, offset=(0, 0))
    arr[0:2, 0:2] = patch
    out = m.refresh()
    assert out["incremental"] is False  # full rebuild, not a delta merge
    _close(m.totals(), _expect(arr))
