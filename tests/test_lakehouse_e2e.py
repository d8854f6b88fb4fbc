"""The whole record-table loop in one scenario: CDC stream ingestion →
incremental aggregate view → layout maintenance → change feed →
history audit — every stage composing on the same MVCC dataset."""

from __future__ import annotations

import pytest
from pyspark.sql.datasource import EqualTo

from mandoline_hbase_spark.layout import cluster_records
from mandoline_hbase_spark.materialized import IncrementalRecordAgg
from mandoline_hbase_spark.streaming.cdc import apply_cdc_stream
from mandoline_hbase_spark.versioning import history_df, record_changes

SCHEMA = "id BIGINT, cat STRING, v DOUBLE"
CDC_SCHEMA = SCHEMA + ", op STRING, seq BIGINT"


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-lakehouse-e2e",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse"},
    )
    register(spark)
    yield spark


def test_full_lakehouse_loop(ds_spark, tmp_path):
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.sources.datasource import _snapshot

    schema = mk_schema(
        {"root": "integration-testing.mandoline.io", "base_path": str(tmp_path)}
    )
    schema.create_dataset("lake")
    conn = schema.connect("lake")
    path = conn.dataset_dir

    # 1. seed + CDC stream ingestion (exactly-once merge sink)
    (
        ds_spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(40)], SCHEMA
        )
        .repartitionByRange(4, "id")
        .write.format("mandoline")
        .option("path", path)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    src = tmp_path / "cdc-src"
    for events in (
        [(3, "a", 300.0, "u", 1), (100, "b", 1.0, "i", 1)],
        [(7, None, None, "d", 1)],
    ):
        ds_spark.createDataFrame(events, CDC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        ds_spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = apply_cdc_stream(
        stream, path, ["id"], checkpoint=str(tmp_path / "ckpt"), seq_col="seq",
        app_id="lake-app",
    )
    q.awaitTermination(120)

    # 2. incremental aggregate view: matches a full recompute
    view = IncrementalRecordAgg(ds_spark, path, str(tmp_path / "view"), ["cat"], ["v"])
    view.refresh()
    table = (
        ds_spark.read.format("mandoline")
        .option("path", path)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )
    expected = {
        r["cat"]: (r["count(1)"], float(r["sum(v)"]))
        for r in table.groupBy("cat").agg({"*": "count", "v": "sum"}).collect()
    }
    got = {r["cat"]: (r["n"], float(r["sum_v"])) for r in view.table().collect()}
    assert got == expected

    # 3. layout maintenance composes; the view refresh after it is a no-op
    #    in value terms (layout deltas cancel)
    cluster_records(ds_spark, path, ["id"], target_rows=10)
    view.refresh()
    assert {r["cat"]: (r["n"], float(r["sum_v"])) for r in view.table().collect()} == expected

    # 4. clustered layout prunes point lookups
    from mandoline_hbase_spark.sources.datasource import MandolinePruningBatchReader

    r = MandolinePruningBatchReader({"path": path, "variable": "records"}, "records")
    r.pushFilters([EqualTo(("id",), 3)])
    assert len(r.partitions()) == 1

    # 5. change feed between the seed and the head nets out to the table
    versions = sorted(int(v["version"]) for v in conn.versions())
    cdf = record_changes(ds_spark, path, versions[0], versions[-1], ["id"]).collect()
    applied = {r.id for r in cdf if r["_change_type"] in ("insert", "update_postimage")}
    removed = {r.id for r in cdf if r["_change_type"] == "delete"}
    assert applied == {3, 100} and removed == {7}

    # 6. history audit shows the CDC stamps
    h = history_df(ds_spark, conn).collect()
    stamped = [r for r in h if r.cdc_app_id == "lake-app"]
    assert len(stamped) >= 2 and max(r.cdc_batch_id for r in stamped) >= 1

    # 7. final state is exact
    rows = {r.id: (r.cat, r.v) for r in table.collect()}
    assert rows[3] == ("a", 300.0) and rows[100] == ("b", 1.0) and 7 not in rows
    assert len(rows) == 40  # 40 seed - 1 delete + 1 insert
