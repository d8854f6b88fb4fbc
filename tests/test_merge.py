"""MERGE INTO on record variables: upsert/delete semantics, chunk-level
copy-on-write (untouched chunks re-pointed, not rewritten), tombstones,
time travel, and the duplicate-source-key guard."""

from __future__ import annotations

import pytest

from mandoline_hbase_spark.merge import merge_records


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-merge-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse"},
    )
    register(spark)
    yield spark


@pytest.fixture()
def store(tmp_path):
    from mandoline_hbase_spark.engine import mk_schema

    schema = mk_schema({"root": "integration-testing.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("merge-ds")
    yield schema.connect("merge-ds")


SCHEMA = "id BIGINT, name STRING, score DOUBLE"


def _seed(ds_spark, store, n=40, parts=4):
    rows = [(i, f"doc-{i}", float(i)) for i in range(n)]
    df = ds_spark.createDataFrame(rows, SCHEMA)
    (
        df.repartition(parts)
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    return dict((r[0], r) for r in rows)


def _read(ds_spark, store, version=None):
    r = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
    )
    if version is not None:
        r = r.option("version", version)
    return {row.id: (row.id, row.name, row.score) for row in r.load().collect()}


def _chunk_map(store):
    from mandoline_hbase_spark.sources.datasource import _snapshot

    _, _, entries = _snapshot(store.dataset_dir, "records", None)
    return {int(c[0]): cid for c, cid in entries}


def test_merge_upsert_updates_and_inserts(ds_spark, store):
    expected = _seed(ds_spark, store)
    before = _chunk_map(store)
    updates = ds_spark.createDataFrame(
        [(3, "updated-3", 30.0), (17, "updated-17", 170.0), (100, "new-100", 1.0)], SCHEMA
    )
    summary = merge_records(ds_spark, store.dataset_dir, updates, ["id"])
    assert summary["updated"] == 2 and summary["inserted"] == 1 and summary["deleted"] == 0
    expected[3] = (3, "updated-3", 30.0)
    expected[17] = (17, "updated-17", 170.0)
    expected[100] = (100, "new-100", 1.0)
    assert _read(ds_spark, store) == expected

    after = _chunk_map(store)
    # copy-on-write: exactly the touched chunks changed ids, the rest
    # re-point to the same content-addressed chunks
    changed = {c for c in before if before[c] != after.get(c)}
    assert len(changed) == summary["chunks_rewritten"] <= 2
    unchanged = {c for c in before if before[c] == after.get(c)}
    assert len(unchanged) == summary["chunks_total"] - summary["chunks_rewritten"]
    # the insert landed on a fresh coordinate
    assert set(after) - set(before), "insert must add a new coordinate"


def test_merge_time_travel_preserves_old_snapshot(ds_spark, store):
    expected = _seed(ds_spark, store, n=10, parts=2)
    versions_before = [int(v["version"]) for v in store.versions()]
    updates = ds_spark.createDataFrame([(1, "rewritten", -1.0)], SCHEMA)
    merge_records(ds_spark, store.dataset_dir, updates, ["id"])
    v_old = max(versions_before)
    old = _read(ds_spark, store, version=v_old)
    assert old == expected, "pre-merge snapshot must be unchanged (MVCC)"
    assert _read(ds_spark, store)[1] == (1, "rewritten", -1.0)


def test_merge_delete_and_tombstone(ds_spark, store):
    expected = _seed(ds_spark, store, n=12, parts=3)
    # delete every row of one chunk (ids are hash-partitioned; delete a
    # spread of keys, then verify counts)
    updates = ds_spark.createDataFrame([(i,) for i in range(0, 12, 2)], "id BIGINT")
    summary = merge_records(
        ds_spark, store.dataset_dir, updates, ["id"], when_matched="delete",
        insert_not_matched=False,
    )
    assert summary["deleted"] == 6 and summary["inserted"] == 0
    got = _read(ds_spark, store)
    assert set(got) == {i for i in range(12) if i % 2 == 1}


def test_merge_delete_all_rows_tombstones_chunks(ds_spark, store):
    _seed(ds_spark, store, n=8, parts=2)
    updates = ds_spark.createDataFrame([(i,) for i in range(8)], "id BIGINT")
    summary = merge_records(
        ds_spark, store.dataset_dir, updates, ["id"], when_matched="delete",
        insert_not_matched=False,
    )
    assert summary["tombstoned"] == summary["chunks_rewritten"] == summary["chunks_total"]
    assert _read(ds_spark, store) == {}


def test_merge_rejects_duplicate_source_keys(ds_spark, store):
    _seed(ds_spark, store, n=4, parts=1)
    updates = ds_spark.createDataFrame([(1, "a", 0.0), (1, "b", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_records(ds_spark, store.dataset_dir, updates, ["id"])


def test_merge_rejects_schema_mismatch(ds_spark, store):
    _seed(ds_spark, store, n=4, parts=1)
    updates = ds_spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    with pytest.raises(ValueError, match="schema"):
        merge_records(ds_spark, store.dataset_dir, updates, ["id"])


def test_merge_insert_only_behaves_like_append(ds_spark, store):
    expected = _seed(ds_spark, store, n=6, parts=2)
    updates = ds_spark.createDataFrame([(50, "fresh", 5.0)], SCHEMA)
    summary = merge_records(ds_spark, store.dataset_dir, updates, ["id"])
    assert summary["chunks_rewritten"] == 0 and summary["inserted"] == 1
    expected[50] = (50, "fresh", 5.0)
    assert _read(ds_spark, store) == expected


def test_concurrent_modification_detected(ds_spark, store, monkeypatch):
    """A merge planned against a snapshot must refuse to commit if another
    writer re-pointed any coordinate it rewrites (lost-update guard)."""
    import mandoline_hbase_spark.merge as merge_mod
    from mandoline_hbase_spark.errors import CommitConflictError
    from mandoline_hbase_spark.sources.datasource import _snapshot as real_snapshot

    _seed(ds_spark, store, n=20, parts=2)
    stale = real_snapshot(store.dataset_dir, "records", None)

    # interfering writer: rewrites the chunk holding id=1
    merge_records(
        ds_spark, store.dataset_dir,
        ds_spark.createDataFrame([(1, "theirs", -1.0)], SCHEMA), ["id"],
    )

    calls = {"n": 0}

    def snapshot_stale_first(path, var, version):
        calls["n"] += 1
        if calls["n"] == 1:
            return stale  # plan against the PRE-interference snapshot
        return real_snapshot(path, var, version)

    monkeypatch.setattr(merge_mod, "_snapshot", snapshot_stale_first)
    with pytest.raises(CommitConflictError, match="changed concurrently"):
        merge_records(
            ds_spark, store.dataset_dir,
            ds_spark.createDataFrame([(1, "mine", -2.0)], SCHEMA), ["id"],
        )
    monkeypatch.undo()
    # the refused merge left nothing visible; the interferer's write survives
    assert _read(ds_spark, store)[1] == (1, "theirs", -1.0)
    # retry against the head succeeds
    merge_records(
        ds_spark, store.dataset_dir,
        ds_spark.createDataFrame([(1, "mine", -2.0)], SCHEMA), ["id"],
    )
    assert _read(ds_spark, store)[1] == (1, "mine", -2.0)


def test_disjoint_concurrent_merges_compose(ds_spark, store, monkeypatch):
    """Stale planning is fine when the touched coordinates are disjoint:
    an insert planned before a concurrent append lands on a fresh
    coordinate instead of overwriting theirs."""
    import mandoline_hbase_spark.merge as merge_mod
    from mandoline_hbase_spark.sources.datasource import _snapshot as real_snapshot

    _seed(ds_spark, store, n=8, parts=2)
    stale = real_snapshot(store.dataset_dir, "records", None)

    # interfering writer appends a new record (new coordinate)
    merge_records(
        ds_spark, store.dataset_dir,
        ds_spark.createDataFrame([(100, "theirs", 1.0)], SCHEMA), ["id"],
    )

    calls = {"n": 0}

    def snapshot_stale_first(path, var, version):
        calls["n"] += 1
        return stale if calls["n"] == 1 else real_snapshot(path, var, version)

    monkeypatch.setattr(merge_mod, "_snapshot", snapshot_stale_first)
    merge_records(
        ds_spark, store.dataset_dir,
        ds_spark.createDataFrame([(200, "mine", 2.0)], SCHEMA), ["id"],
    )
    monkeypatch.undo()
    got = _read(ds_spark, store)
    assert got[100] == (100, "theirs", 1.0) and got[200] == (200, "mine", 2.0)


def test_merge_update_can_set_null(ds_spark, store):
    """An update writing NULL into a column must actually null it (pandas
    DataFrame.update would silently skip NaN — regression guard)."""
    _seed(ds_spark, store, n=6, parts=2)
    upd = ds_spark.createDataFrame([(2, None, None)], SCHEMA)
    merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    got = _read(ds_spark, store)
    assert got[2] == (2, None, None)


def test_merge_crash_before_version_row_is_invisible(ds_spark, store, monkeypatch):
    """The failed-write contract on the merge path: a crash after chunks
    and index rows are written but BEFORE the version row leaves nothing
    visible, the dataset keeps serving the old state, a retry succeeds,
    and maintenance reclaims the orphans."""
    from mandoline_hbase_spark import maintenance
    from mandoline_hbase_spark.engine import Connection

    expected = _seed(ds_spark, store, n=10, parts=2)

    real_write_version = Connection.write_version

    def boom(self, metadata):
        raise RuntimeError("injected crash at the commit point")

    monkeypatch.setattr(Connection, "write_version", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_records(
            ds_spark, store.dataset_dir,
            ds_spark.createDataFrame([(1, "lost", 0.0)], SCHEMA), ["id"],
        )
    monkeypatch.setattr(Connection, "write_version", real_write_version)

    assert _read(ds_spark, store) == expected, "failed merge must be invisible"
    assert len(store.versions()) == 1

    # the orphaned index rows + reservation are sweepable, then a retry lands
    store.spark = ds_spark
    maintenance.sweep_failed_commits(store, ds_spark, older_than_s=0.0)
    maintenance.gc_chunks(store, ds_spark)
    assert _read(ds_spark, store) == expected
    merge_records(
        ds_spark, store.dataset_dir,
        ds_spark.createDataFrame([(1, "retry", 9.0)], SCHEMA), ["id"],
    )
    assert _read(ds_spark, store)[1] == (1, "retry", 9.0)


def test_merge_driver_state_is_o1(ds_spark, store, monkeypatch):
    """The rewrite/insert manifests never funnel through the driver: every
    driver-side collect in the merge path returns O(1) rows (aggregate
    counts, conflict probes) — never the per-touched-chunk manifest.
    Executors write payloads, ref deltas AND index rows; the driver
    appends only the version row."""
    from pyspark.sql import DataFrame

    _seed(ds_spark, store, n=40, parts=8)

    orig_collect = DataFrame.collect

    def bounded_collect(self, *a, **k):
        rows = orig_collect(self, *a, **k)
        assert len(rows) <= 8, (
            f"driver-side collect of {len(rows)} rows in the merge path "
            "(manifest funneled through the driver)"
        )
        return rows

    def no_topandas(self, *a, **k):
        raise AssertionError("driver-side toPandas() in the merge path")

    monkeypatch.setattr(DataFrame, "collect", bounded_collect)
    monkeypatch.setattr(DataFrame, "toPandas", no_topandas)
    upd = ds_spark.createDataFrame(
        [(i, f"upd-{i}", -1.0) for i in range(0, 40, 3)]
        + [(100 + i, f"new-{i}", 9.0) for i in range(6)],
        SCHEMA,
    )
    res = merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    monkeypatch.undo()
    assert res["updated"] == 14 and res["inserted"] == 6
    got = _read(ds_spark, store)
    assert len(got) == 46
    for i in range(0, 40, 3):
        assert got[i] == (i, f"upd-{i}", -1.0)
    for i in range(6):
        assert got[100 + i] == (100 + i, f"new-{i}", 9.0)


def test_merge_aborts_when_reservation_swept(ds_spark, store, monkeypatch):
    """MERGE reserves its version id before the distributed rewrite; if
    the failed-commit sweeper reclaims the reservation mid-job, the
    commit must abort loudly instead of publishing a version whose
    executor-written rows were reclaimed."""
    from mandoline_hbase_spark import storage
    from mandoline_hbase_spark.errors import CommitConflictError

    _seed(ds_spark, store, n=20, parts=4)
    v_before = store.latest_version_id()

    real_lock = storage.dataset_lock

    def sweeping_lock(path, **kw):
        # the sweeper strikes right before the commit section
        for rid in storage.reserved_version_ids(store._dirs["versions"]):
            storage.release_version_reservation(store._dirs["versions"], rid)
        return real_lock(path, **kw)

    monkeypatch.setattr("mandoline_hbase_spark.merge.storage.dataset_lock", sweeping_lock)
    upd = ds_spark.createDataFrame([(1, "x", 0.0)], SCHEMA)
    with pytest.raises(CommitConflictError, match="swept"):
        merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    monkeypatch.undo()
    store._version_cache = None
    assert store.latest_version_id() == v_before  # nothing was published


def test_merge_chunk_ids_deterministic_across_row_orders(ds_spark, tmp_path):
    """Chunk BYTES (and therefore content-addressed ids) must not depend
    on row ARRIVAL ORDER within a partition: two merges of the same
    logical update set, fed in opposite input orders through the same
    hash partitioning, produce identical chunk maps. This is what makes
    a task retry safe — a recomputed partition (whose shuffle rows can
    arrive in any order) re-derives the same cid its ref/index rows
    were credited to. (Chunk GRANULARITY legitimately follows the
    partition count; only intra-partition order must not matter.)"""
    from mandoline_hbase_spark.engine import mk_schema

    upd_rows = [(i, f"u-{i}", float(-i)) for i in range(0, 30, 2)] + [
        (200 + i, f"n-{i}", 1.0) for i in range(5)
    ]
    maps = []
    for variant, rows in (("a", upd_rows), ("b", list(reversed(upd_rows)))):
        schema = mk_schema(
            {"root": "det.mandoline.io", "base_path": str(tmp_path / variant)}
        )
        schema.create_dataset("ds")
        store = schema.connect("ds")
        _seed(ds_spark, store, n=30, parts=3)
        upd = ds_spark.createDataFrame(rows, SCHEMA).repartition(4, "id")
        merge_records(ds_spark, store.dataset_dir, upd, ["id"])
        maps.append(_chunk_map(store))
    assert maps[0] == maps[1]
