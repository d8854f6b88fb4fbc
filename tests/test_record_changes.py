"""Content-addressed change data feed between record versions: CDF row
format, cost bounded by changed chunks, layout rewrites emit nothing."""

from __future__ import annotations

import pytest

from mandoline_hbase_spark.merge import merge_records
from mandoline_hbase_spark.versioning import record_changes

SCHEMA = "id BIGINT, name STRING, score DOUBLE"


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-cdf-tests",
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
    schema.create_dataset("cdf-ds")
    yield schema.connect("cdf-ds")


def _seed(ds_spark, store, n=20):
    (
        ds_spark.createDataFrame([(i, f"n{i}", float(i)) for i in range(n)], SCHEMA)
        .repartitionByRange(4, "id")
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )


def _v(store, idx):
    vs = sorted(int(v["version"]) for v in store.versions())
    return vs[idx]


def test_cdf_rows_for_merge(ds_spark, store):
    _seed(ds_spark, store)
    v0 = _v(store, 0)
    upd = ds_spark.createDataFrame([(3, "n3-v2", 33.0), (99, "new", 9.0)], SCHEMA)
    merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    del_df = ds_spark.createDataFrame([(5,)], "id BIGINT")
    merge_records(
        ds_spark, store.dataset_dir, del_df, ["id"], when_matched="delete",
        insert_not_matched=False,
    )
    v2 = _v(store, -1)
    rows = record_changes(ds_spark, store.dataset_dir, v0, v2, ["id"]).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append((r.id, r.name, r.score))
    assert by_type["insert"] == [(99, "new", 9.0)]
    assert by_type["delete"] == [(5, "n5", 5.0)]
    assert by_type["update_preimage"] == [(3, "n3", 3.0)]
    assert by_type["update_postimage"] == [(3, "n3-v2", 33.0)]


def test_layout_rewrite_emits_no_changes(ds_spark, store):
    from mandoline_hbase_spark.layout import cluster_records

    _seed(ds_spark, store)
    v0 = _v(store, 0)
    cluster_records(ds_spark, store.dataset_dir, ["name"], target_rows=5)
    v1 = _v(store, -1)
    assert record_changes(ds_spark, store.dataset_dir, v0, v1, ["id"]).count() == 0


def test_unchanged_chunks_are_never_read(ds_spark, store, monkeypatch):
    """Only chunks whose id differs between the bounds are decoded."""
    from mandoline_hbase_spark.sources.datasource import _snapshot

    _seed(ds_spark, store)
    v0 = _v(store, 0)
    upd = ds_spark.createDataFrame([(3, "x", 0.0)], SCHEMA)
    merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    v1 = _v(store, -1)
    _, _, e0 = _snapshot(store.dataset_dir, "records", v0)
    _, _, e1 = _snapshot(store.dataset_dir, "records", v1)
    shared = {cid for _, cid in e0} & {cid for _, cid in e1}
    assert shared, "merge must leave untouched chunks re-pointed"
    # the diff plan's decoded chunk set = symmetric difference only
    diff = record_changes(ds_spark, store.dataset_dir, v0, v1, ["id"])
    touched = {r.id for r in diff.collect() if r["_change_type"].startswith("update")}
    assert touched == {3}


def test_cdf_across_schema_evolution(ds_spark, store):
    (
        ds_spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, name STRING")
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    v0 = _v(store, 0)
    (
        ds_spark.createDataFrame([(3, "c", 3.0)], SCHEMA)
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    v1 = _v(store, -1)
    rows = record_changes(ds_spark, store.dataset_dir, v0, v1, ["id"]).collect()
    assert [(r["_change_type"], r.id, r.score) for r in rows] == [("insert", 3, 3.0)]


def test_history_df(ds_spark, store):
    from mandoline_hbase_spark.streaming.cdc import apply_cdc_batch
    from mandoline_hbase_spark.versioning import history_df

    _seed(ds_spark, store, n=4)
    batch = ds_spark.createDataFrame(
        [(9, "x", 1.0, "i", 1)], SCHEMA + ", op STRING, seq BIGINT"
    )
    apply_cdc_batch(
        ds_spark, store.dataset_dir, batch, ["id"], seq_col="seq",
        batch_id=7, app_id="app-h",
    )
    h = history_df(ds_spark, store).collect()
    assert h[0].version_id > h[-1].version_id  # newest first
    assert h[0].cdc_app_id == "app-h" and h[0].cdc_batch_id == 7
    assert "records" in h[0].variables
    assert h[-1].cdc_app_id is None


def test_rollback_undoes_merge_zero_copy(ds_spark, store):
    """rollback_variable is generic over the index: undoing a merge on a
    RECORD variable re-points coordinates with no data copy, and the
    merge's version stays readable at its own id."""
    from mandoline_hbase_spark.merge import merge_records
    from mandoline_hbase_spark.versioning import rollback_variable

    _seed(ds_spark, store, n=10)
    v_good = int(store.versions()[0]["version"])
    merge_records(
        ds_spark, store.dataset_dir,
        ds_spark.createDataFrame([(1, "bad", -1.0)], SCHEMA), ["id"],
    )
    v_bad = int(store.versions()[0]["version"])
    store.spark = ds_spark
    rollback_variable(store, "records", v_good, spark=ds_spark)

    def read(version=None):
        r = (
            ds_spark.read.format("mandoline")
            .option("path", store.dataset_dir)
            .option("variable", "records")
            .option("form", "records")
        )
        if version is not None:
            r = r.option("version", version)
        return {row.id: row.name for row in r.load().collect()}

    assert read()[1] == "n1", "head restored to the pre-merge state"
    assert read(version=v_bad)[1] == "bad", "the undone merge stays in history"
