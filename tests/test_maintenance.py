"""Maintenance layer: ref-log compaction, chunk GC, version retention.

The reference has no GC at all — ref-counts are maintained
(hbase.clj:156-172) but nothing ever deletes a dead chunk. These tests
pin the engine-side semantics from SURVEY.md §7: compaction and GC never
change any read result for retained versions, and retention keeps
latest-<=-bound resolution byte-identical at every retained bound.
"""

from __future__ import annotations

import numpy as np
import pytest


def _n_parquet_files(conn, role: str) -> int:
    import os

    d = conn._dirs[role]
    return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))


def test_compact_chunks_preserves_reads(store, spark):
    store.spark = spark
    cs = store.chunk_store()
    cs.write_chunk("aaa", 2, b"payload-a")
    cs.write_chunk("bbb", 1, b"payload-b")
    for _ in range(5):
        cs.update_chunk_refs("aaa", 1)
    cs.update_chunk_refs("bbb", -1)

    stats = store.compact_chunks()
    assert stats["records_before"] == 8
    assert stats["records_after"] == 2
    assert cs.chunk_refs("aaa") == 7
    assert cs.chunk_refs("bbb") == 0
    assert cs.read_chunk("aaa") == b"payload-a"
    assert cs.read_chunk("bbb") == b"payload-b"
    assert _n_parquet_files(store, "chunks") <= 2


def test_gc_drops_dead_unreferenced_chunks_only(store, spark):
    store.spark = spark
    arr = np.arange(64, dtype=np.float64).reshape(8, 8)
    store.write_variable("x", arr, chunk_shape=(4, 4))

    cs = store.chunk_store()
    # Dead orphan: never indexed, refs driven to zero.
    cs.write_chunk("orphan", 1, b"dead-bytes")
    cs.update_chunk_refs("orphan", -1)
    # Zero-ref but still referenced by an index record: must survive (the
    # anti-join guard protects against under-counted refs).
    live_id = store.chunk_map_df("x", store.latest_version_id()).select("chunk_id").first()[0]
    refs_now = cs.chunk_refs(live_id)
    cs.update_chunk_refs(live_id, -refs_now)

    stats = store.gc_chunks()
    assert stats["chunks_removed"] == 1
    with pytest.raises(Exception):
        cs.read_chunk("orphan")
    assert cs.read_chunk(live_id)  # still readable
    assert np.array_equal(store.read_variable("x"), arr)


def test_prune_versions_keeps_reads_at_retained_bounds(store, spark):
    store.spark = spark
    arrs = [np.full((6, 6), i, dtype=np.float64) for i in range(4)]
    vids = [store.write_variable("x", a, chunk_shape=(3, 3)) for a in arrs]

    stats = store.prune_versions(keep_last=2)
    assert stats["floor"] == vids[2]
    assert stats["versions_dropped"] == 2

    # Retained bounds read byte-identically (incl. latest-<= resolution).
    assert np.array_equal(store.read_variable("x", version=vids[2]), arrs[2])
    assert np.array_equal(store.read_variable("x", version=vids[3]), arrs[3])
    assert np.array_equal(store.read_variable("x"), arrs[3])
    # Dropped versions are gone from the listing.
    listed = [v["version"] for v in store.versions()]
    assert listed == [str(vids[3]), str(vids[2])]

    # Released refs + GC reclaims the dropped versions' chunk bytes.
    gc = store.gc_chunks()
    assert gc["chunks_removed"] >= 1
    assert np.array_equal(store.read_variable("x"), arrs[3])


def test_prune_versions_keeps_anchor_below_floor(store, spark):
    """A coord last written BEFORE the floor must keep its anchor entry."""
    store.spark = spark
    a0 = np.arange(36, dtype=np.float64).reshape(6, 6)
    v0 = store.write_variable("x", a0, chunk_shape=(3, 3))
    # Later versions touch a different variable only; x's entries all sit
    # below the retention floor but stay reachable.
    store.write_variable("y", np.ones((4,), dtype=np.float64))
    v2 = store.write_variable("y", np.zeros((4,), dtype=np.float64))

    stats = store.prune_versions(keep_last=2)
    assert stats["floor"] is not None and stats["floor"] > v0
    assert np.array_equal(store.read_variable("x"), a0)
    assert np.array_equal(store.read_variable("x", version=v2), a0)


def test_prune_noop_when_history_fits(store, spark):
    store.spark = spark
    store.write_variable("x", np.ones((4,), dtype=np.float64))
    stats = store.prune_versions(keep_last=5)
    assert stats == {
        "floor": None,
        "versions_dropped": 0,
        "index_keys_dropped": 0,
        "refs_released": 0,
    }


def test_compaction_clusters_chunks_by_id_for_point_pruning(store, spark):
    """The compacted chunks log is range-clustered by chunk_id: files hold
    disjoint sorted id ranges, so a point fetch's min/max-stats candidate
    set is exactly one file — the scan-key clustering that keeps
    read_chunk O(1) files at billions of chunks."""
    import os

    import pyarrow.parquet as pq

    cs = store.chunk_store()
    for i in range(64):
        cs.write_chunk(f"{i:02d}-" + "c" * 38, 1, f"payload-{i}".encode())
    store.spark = spark
    store.compact_chunks()

    d = store._dirs["chunks"]
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    ranges = []
    for f in files:
        md = pq.ParquetFile(os.path.join(d, f)).metadata
        idx = md.schema.to_arrow_schema().names.index("chunk_id")
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # actually split across files
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # disjoint: every point id maps to exactly one file

    probe = "33-" + "c" * 38
    candidates = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(candidates) == 1
    assert cs.read_chunk(probe) == b"payload-33"


def test_compact_indices_drops_superseded_cas_only(store, spark):
    """Superseded CAS attempts vanish; current values (including
    tombstones) and every read at every bound are unchanged."""
    import numpy as np

    store.spark = spark
    a0 = np.zeros((4, 4), dtype=np.float64)
    a1 = np.ones((4, 4), dtype=np.float64)
    v0 = store.write_variable("x", a0, chunk_shape=(2, 2))
    v1 = store.write_variable("x", a1, chunk_shape=(2, 2))

    # CAS churn on one key at v1: each successful swap supersedes the
    # previous record for (x, (0,0), v1)
    idx = store.index("x", store.metadata(v1))
    orig = idx.chunk_at((0, 0), v1)
    cur = orig
    for other in ["h1", "h2"]:
        assert idx.write_index((0, 0), cur, other)
        cur = other
    assert idx.write_index((0, 0), cur, orig)  # swap back to the real chunk

    n_before = store.spark_table("indices", spark).count()
    stats = store.compact_indices()
    assert stats["records_dropped"] == 3  # the three superseded attempts
    assert stats["records_after"] == n_before - 3
    assert np.array_equal(store.read_variable("x", version=v0), a0)
    assert np.array_equal(store.read_variable("x", version=v1), a1)


def test_optimize_runs_all_passes_and_preserves_reads(store, spark):
    import numpy as np

    store.spark = spark
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    store.write_variable("x", arr, chunk_shape=(2, 2))
    store.write_variable("x", arr + 1, chunk_shape=(2, 2))
    out = store.optimize()
    assert set(out) == {"indices", "chunks", "gc", "stats"}
    assert np.array_equal(store.read_variable("x"), arr + 1)


def test_maintenance_driver_state_is_o1(store, spark, monkeypatch):
    """Retention and failed-commit sweeps must never funnel per-chunk
    ref-delta rows through the driver: negative deltas are written from
    the executors (the same distributed-append shape the ingest commit
    uses), so a sweep dropping millions of chunks commits with O(1)
    driver memory. Mirrors test_distributed_ingest_driver_state_is_o1."""
    from pyspark.sql import DataFrame

    store.spark = spark
    arrs = [np.full((6, 6), i, dtype=np.float64) for i in range(4)]
    vids = [store.write_variable("x", a, chunk_shape=(3, 3)) for a in arrs]

    def _no_collect(self, *a, **k):
        raise AssertionError("driver-side collect() in the maintenance path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    monkeypatch.setattr(DataFrame, "toPandas", _no_collect)
    stats = store.prune_versions(keep_last=2)
    sweep = store.sweep_failed_commits(older_than_s=0.0)
    monkeypatch.undo()

    assert stats["floor"] == vids[2] and stats["refs_released"] >= 1
    assert sweep["index_rows_dropped"] == 0
    # Released refs are really in the log: GC reclaims the dropped bytes.
    assert store.gc_chunks()["chunks_removed"] >= 1
    assert np.array_equal(store.read_variable("x"), arrs[3])
    assert np.array_equal(store.read_variable("x", version=vids[2]), arrs[2])


def test_sweep_reads_marker_age_through_backend_not_stat(store, spark, monkeypatch):
    """Reservation-marker age comes from the marker payload via the CAS
    backend, never os.stat on a local path — a pure object-store backend
    has no file to stat, and the old stat path silently skipped every
    stale reservation there (ids never released)."""
    import os
    import time

    from mandoline_hbase_spark import storage

    store.spark = spark
    vdir = store._dirs["versions"]
    rid = storage.reserve_version_id(vdir, 1)
    # Backdate the PAYLOAD only; freshen the file mtime so a stat-based
    # age would wrongly read "young".
    marker = os.path.join(vdir, f".reserved-{rid}")
    storage.cas_backend_for(vdir).put(marker, repr(time.time() - 7200).encode())
    os.utime(marker, None)

    real_stat = os.stat

    def _no_stat_markers(path, *a, **k):
        if ".reserved-" in str(path):
            raise AssertionError("os.stat on a reservation marker in the sweep path")
        return real_stat(path, *a, **k)

    monkeypatch.setattr(os, "stat", _no_stat_markers)
    swept = store.sweep_failed_commits(older_than_s=3600.0)
    monkeypatch.undo()
    assert swept["reservations_cleared"] == 1
    assert rid not in storage.reserved_version_ids(vdir)

    # unknown-age markers (legacy empty payload, no statable file) are
    # protected, not reclaimed
    rid2 = storage.reserve_version_id(vdir, rid + 1)
    marker2 = os.path.join(vdir, f".reserved-{rid2}")
    storage.cas_backend_for(vdir).put(marker2, b"")

    def _no_local_file(path, *a, **k):
        if ".reserved-" in str(path):
            raise FileNotFoundError(path)  # object-store backend: no local file
        return real_stat(path, *a, **k)

    monkeypatch.setattr(os, "stat", _no_local_file)
    try:
        assert storage.reservation_created_at(vdir, rid2) == float("inf")
        swept2 = store.sweep_failed_commits(older_than_s=0.0)
    finally:
        monkeypatch.undo()
    assert swept2["reservations_cleared"] == 0
    assert rid2 in storage.reserved_version_ids(vdir)
    storage.release_version_reservation(vdir, rid2)


def test_crash_between_stage_and_publish_leaks_refs_never_dangles(store, spark, monkeypatch):
    """Crash ordering of the staged ref-delta publish: deltas become
    visible only AFTER the index rewrite, so a crash in between leaves
    leaked refs (chunk kept — recoverable by re-running the sweep's GC)
    and never an index row pointing at a GC-able chunk."""
    from mandoline_hbase_spark import maintenance

    store.spark = spark
    arrs = [np.full((4, 4), i, dtype=np.float64) for i in range(3)]
    vids = [store.write_variable("x", a, chunk_shape=(2, 2)) for a in arrs]

    real_publish = maintenance._publish_ref_deltas

    def crash_publish(conn, tmp_dir, chunks_touched):
        raise RuntimeError("simulated crash before ref-delta publish")

    monkeypatch.setattr(maintenance, "_publish_ref_deltas", crash_publish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.prune_versions(keep_last=1)
    monkeypatch.undo()

    # the index rewrite landed but no refs were released and the
    # versions table was not yet rewritten: GC must NOT reclaim the
    # dropped versions' chunks, the latest read stays byte-identical,
    # and RE-RUNNING the sweep completes retention cleanly
    assert store.gc_chunks()["chunks_removed"] == 0
    assert np.array_equal(store.read_variable("x"), arrs[2])
    store.prune_versions(keep_last=1)
    assert [v["version"] for v in store.versions()] == [str(vids[2])]
    assert np.array_equal(store.read_variable("x"), arrs[2])
