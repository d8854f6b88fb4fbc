"""Record-variable schema evolution: add/drop/widen columns with
schema-on-read reconciliation — committed chunks are never rewritten."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-evolution-tests",
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
    schema.create_dataset("evo-ds")
    yield schema.connect("evo-ds")


def _write(ds_spark, store, rows, ddl):
    (
        ds_spark.createDataFrame(rows, ddl)
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )


def _read_df(ds_spark, store):
    return (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )


def test_add_column_pads_old_chunks_with_null(ds_spark, store):
    _write(ds_spark, store, [(1, "a"), (2, "b")], "id BIGINT, name STRING")
    _write(ds_spark, store, [(3, "c", 3.5)], "id BIGINT, name STRING, score DOUBLE")
    df = _read_df(ds_spark, store)
    assert df.schema.simpleString() == "struct<id:bigint,name:string,score:double>"
    got = {r.id: (r.name, r.score) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 3.5)}


def test_drop_column_projects_old_chunks(ds_spark, store):
    _write(ds_spark, store, [(1, "a", 1.0)], "id BIGINT, name STRING, score DOUBLE")
    _write(ds_spark, store, [(2, "b")], "id BIGINT, name STRING")
    df = _read_df(ds_spark, store)
    assert df.schema.simpleString() == "struct<id:bigint,name:string>"
    assert {(r.id, r.name) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_widen_int_to_bigint(ds_spark, store):
    _write(ds_spark, store, [(1, 10)], "id BIGINT, v INT")
    _write(ds_spark, store, [(2, 2**40)], "id BIGINT, v BIGINT")
    df = _read_df(ds_spark, store)
    assert df.schema.simpleString() == "struct<id:bigint,v:bigint>"
    assert {r.v for r in df.collect()} == {10, 2**40}


def test_incompatible_evolution_rejected_before_tasks(ds_spark, store):
    _write(ds_spark, store, [(1, "a")], "id BIGINT, name STRING")
    with pytest.raises(Exception, match="incompatible schema evolution"):
        _write(ds_spark, store, [(2, 5)], "id BIGINT, name INT")
    # narrowing is rejected too
    with pytest.raises(Exception, match="incompatible schema evolution"):
        _write(ds_spark, store, [(2, "b")], "id INT, name STRING")


def test_merge_after_evolution_rewrites_at_current_schema(ds_spark, store):
    from mandoline_hbase_spark.merge import merge_records

    _write(ds_spark, store, [(1, "a"), (2, "b")], "id BIGINT, name STRING")
    _write(ds_spark, store, [(3, "c", 3.5)], "id BIGINT, name STRING, score DOUBLE")
    upd = ds_spark.createDataFrame(
        [(1, "a-v2", 11.0)], "id BIGINT, name STRING, score DOUBLE"
    )
    s = merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    assert s["updated"] == 1 and s["inserted"] == 0
    got = {r.id: (r.name, r.score) for r in _read_df(ds_spark, store).collect()}
    assert got == {1: ("a-v2", 11.0), 2: ("b", None), 3: ("c", 3.5)}


def test_time_travel_reads_old_schema(ds_spark, store):
    _write(ds_spark, store, [(1, "a")], "id BIGINT, name STRING")
    v_old = int(store.versions()[0]["version"])
    _write(ds_spark, store, [(2, "b", 2.0)], "id BIGINT, name STRING, score DOUBLE")
    df_old = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .option("version", v_old)
        .load()
    )
    assert df_old.schema.simpleString() == "struct<id:bigint,name:string>"
    assert [(r.id, r.name) for r in df_old.collect()] == [(1, "a")]


def test_concurrent_evolution_during_merge_raises(ds_spark, store, monkeypatch):
    """A schema evolution that lands between merge PLANNING and merge
    COMMIT touches no rewritten coordinate, so the stale-coordinate check
    cannot see it — committing would silently revert schema_json to the
    pre-evolution schema. The commit must re-validate the head's schema
    inside the lock and refuse."""
    from contextlib import contextmanager

    from mandoline_hbase_spark import merge as merge_mod
    from mandoline_hbase_spark.errors import CommitConflictError

    _write(ds_spark, store, [(1, "a"), (2, "b")], "id BIGINT, name STRING")

    evolved = {"done": False}
    orig_lock = merge_mod.storage.dataset_lock

    @contextmanager
    def racing_lock(path, **kw):
        # evolution lands after merge PLANNING, before the commit lock
        if not evolved["done"]:
            evolved["done"] = True
            _write(
                ds_spark, store, [(3, "c", 7.5)], "id BIGINT, name STRING, score DOUBLE"
            )
        with orig_lock(path, **kw) as x:
            yield x

    monkeypatch.setattr(merge_mod.storage, "dataset_lock", racing_lock)
    updates = ds_spark.createDataFrame([(1, "a2")], "id BIGINT, name STRING")
    with pytest.raises(CommitConflictError, match="evolved concurrently"):
        merge_mod.merge_records(ds_spark, store.dataset_dir, updates, ["id"])
    monkeypatch.undo()
    # the evolved schema survived untouched; re-planned merge succeeds
    assert "score" in _read_df(ds_spark, store).columns
    merge_mod.merge_records(
        ds_spark,
        store.dataset_dir,
        ds_spark.createDataFrame([(1, "a2", None)], "id BIGINT, name STRING, score DOUBLE"),
        ["id"],
    )
    got = {r["id"]: r["name"] for r in _read_df(ds_spark, store).collect()}
    assert got[1] == "a2" and got[3] == "c"
