"""Incrementally maintained GROUP BY over record tables: delta refresh
equals full recompute after arbitrary merges; refresh cost is bounded by
changed chunks; layout rewrites cancel exactly."""

from __future__ import annotations

import pytest

from mandoline_hbase_spark.materialized import IncrementalRecordAgg
from mandoline_hbase_spark.merge import merge_records

SCHEMA = "id BIGINT, cat STRING, v DOUBLE"


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-recordagg-tests",
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
    schema.create_dataset("agg-ds")
    yield schema.connect("agg-ds")


def _seed(ds_spark, store, n=60):
    rows = [(i, "abc"[i % 3], float(i % 10)) for i in range(n)]
    (
        ds_spark.createDataFrame(rows, SCHEMA)
        .repartitionByRange(4, "id")
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )


def _full_recompute(ds_spark, store):
    df = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )
    out = {}
    for r in df.groupBy("cat").agg({"*": "count", "v": "sum"}).collect():
        out[r["cat"]] = (r["count(1)"], float(r["sum(v)"]))
    return out


def _state(view):
    return {
        r["cat"]: (r["n"], float(r["sum_v"]))
        for r in view.table().collect()
    }


def test_incremental_matches_full_recompute(ds_spark, store, tmp_path):
    _seed(ds_spark, store)
    view = IncrementalRecordAgg(
        ds_spark, store.dataset_dir, str(tmp_path / "state"), ["cat"], ["v"]
    )
    view.refresh()
    assert _state(view) == _full_recompute(ds_spark, store)

    # merge: updates move rows across groups, deletes shrink, inserts add
    upd = ds_spark.createDataFrame(
        [(3, "z", 100.0), (6, "z", 100.0), (200, "z", 7.0)], SCHEMA
    )
    merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    dels = ds_spark.createDataFrame([(9,), (12,)], "id BIGINT")
    merge_records(
        ds_spark, store.dataset_dir, dels, ["id"], when_matched="delete",
        insert_not_matched=False,
    )
    s = view.refresh()
    assert not s["noop"]
    assert _state(view) == _full_recompute(ds_spark, store)


def test_refresh_cost_bounded_by_changed_chunks(ds_spark, store, tmp_path):
    _seed(ds_spark, store)
    view = IncrementalRecordAgg(
        ds_spark, store.dataset_dir, str(tmp_path / "state"), ["cat"], ["v"]
    )
    first = view.refresh()
    assert first["chunks_decoded"] == 4  # initial full build
    upd = ds_spark.createDataFrame([(1, "a", 0.0)], SCHEMA)
    merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    second = view.refresh()
    assert second["chunks_decoded"] == 2  # one old chunk out, one new in
    assert _state(view) == _full_recompute(ds_spark, store)
    assert view.refresh()["noop"] is True


def test_layout_rewrite_cancels_exactly(ds_spark, store, tmp_path):
    from mandoline_hbase_spark.layout import cluster_records

    _seed(ds_spark, store)
    view = IncrementalRecordAgg(
        ds_spark, store.dataset_dir, str(tmp_path / "state"), ["cat"], ["v"]
    )
    view.refresh()
    before = _state(view)
    cluster_records(ds_spark, store.dataset_dir, ["cat"], target_rows=15)
    view.refresh()
    assert _state(view) == before == _full_recompute(ds_spark, store)


def test_duplicate_content_chunks_count_with_multiplicity(ds_spark, store, tmp_path):
    """Content addressing maps one chunk id to MULTIPLE coordinates when
    two appends carry identical bytes. The incremental diff must weight
    each chunk by its multiplicity delta (multiset diff): a set diff
    counts the shared chunk once on build and misses the release when a
    merge re-points the duplicated coords — totals drift permanently."""
    rows = [(i, "abc"[i % 3], float(i % 10)) for i in range(15)]
    for _ in range(2):  # identical appends -> 2 coords, SAME chunk id
        (
            ds_spark.createDataFrame(rows, SCHEMA)
            .coalesce(1)
            .write.format("mandoline")
            .option("path", store.dataset_dir)
            .option("variable", "records")
            .mode("append")
            .save()
        )
    view = IncrementalRecordAgg(
        ds_spark, store.dataset_dir, str(tmp_path / "agg"), ["cat"], ["v"]
    )
    view.refresh()
    assert _state(view) == _full_recompute(ds_spark, store)  # doubled counts

    # a merge touching the duplicated key rewrites BOTH coords: the shared
    # chunk's multiplicity drops 2 -> 0 and the rewritten (again shared)
    # chunk's rises 0 -> 2
    updates = ds_spark.createDataFrame([(5, "c", 99.0)], SCHEMA)
    merge_records(ds_spark, store.dataset_dir, updates, ["id"])
    view.refresh()
    assert _state(view) == _full_recompute(ds_spark, store)
