"""CDC apply sink: batch semantics (last-op-per-key, deletes+upserts),
stream equivalence to sequential application, and replay idempotence via
the (app_id, batch_id) stamp committed atomically with the merge."""

from __future__ import annotations

import pytest

from mandoline_hbase_spark.streaming.cdc import (
    apply_cdc_batch,
    apply_cdc_stream,
    last_applied_batch,
)

SCHEMA = "id BIGINT, name STRING, score DOUBLE"
CDC_SCHEMA = SCHEMA + ", op STRING, seq BIGINT"


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-cdc-tests",
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
    schema.create_dataset("cdc-ds")
    yield schema.connect("cdc-ds")


def _seed(ds_spark, store, n=10):
    df = ds_spark.createDataFrame([(i, f"doc-{i}", float(i)) for i in range(n)], SCHEMA)
    (
        df.repartition(2)
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )


def _read(ds_spark, store):
    df = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )
    return {r.id: (r.name, r.score) for r in df.collect()}


def test_batch_last_op_per_key_wins(ds_spark, store):
    _seed(ds_spark, store)
    events = [
        (1, "first", 1.1, "u", 1),
        (1, "second", 1.2, "u", 2),   # later seq wins
        (2, None, None, "d", 1),
        (2, "reborn", 2.2, "i", 2),   # delete then reinsert -> reinsert wins
        (3, "gone", 0.0, "u", 1),
        (3, None, None, "d", 2),      # update then delete -> delete wins
        (50, "new", 5.0, "i", 1),
    ]
    batch = ds_spark.createDataFrame(events, CDC_SCHEMA)
    s = apply_cdc_batch(ds_spark, store.dataset_dir, batch, ["id"], seq_col="seq")
    got = _read(ds_spark, store)
    assert got[1] == ("second", 1.2)
    assert got[2] == ("reborn", 2.2)
    assert 3 not in got
    assert got[50] == ("new", 5.0)
    assert s["deleted"] == 1 and s["inserted"] == 1  # id=3 deleted; id=50 new; id=2 upsert-matched


def test_batch_rejects_unknown_op(ds_spark, store):
    _seed(ds_spark, store, n=2)
    batch = ds_spark.createDataFrame([(1, "x", 0.0, "z", 1)], CDC_SCHEMA)
    with pytest.raises(ValueError, match="unknown CDC ops"):
        apply_cdc_batch(ds_spark, store.dataset_dir, batch, ["id"], seq_col="seq")


def _write_cdc_files(ds_spark, src_dir, batches):
    for i, events in enumerate(batches):
        ds_spark.createDataFrame(events, CDC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src_dir))


def test_stream_apply_and_replay_idempotence(ds_spark, store, tmp_path):
    _seed(ds_spark, store, n=6)
    src = tmp_path / "cdc-src"
    ckpt1 = str(tmp_path / "ckpt1")
    batches = [
        [(0, "zero-v2", 0.5, "u", 1), (90, "ninety", 9.0, "i", 1)],
        [(1, None, None, "d", 1), (90, "ninety-v2", 9.9, "u", 2)],
    ]
    _write_cdc_files(ds_spark, src, batches)

    stream = (
        ds_spark.readStream.schema(CDC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = apply_cdc_stream(
        stream, store.dataset_dir, ["id"], checkpoint=ckpt1, seq_col="seq", app_id="app-x"
    )
    q.awaitTermination(120)
    expected = {
        0: ("zero-v2", 0.5),
        2: ("doc-2", 2.0),
        3: ("doc-3", 3.0),
        4: ("doc-4", 4.0),
        5: ("doc-5", 5.0),
        90: ("ninety-v2", 9.9),
    }
    assert _read(ds_spark, store) == expected
    assert last_applied_batch(store.dataset_dir, "app-x") is not None

    # replay with a FRESH checkpoint but the same app id: every batch id
    # re-delivers; the stamp makes each a no-op (no new versions)
    n_versions = len(store.versions())
    ckpt2 = str(tmp_path / "ckpt2")
    stream2 = (
        ds_spark.readStream.schema(CDC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q2 = apply_cdc_stream(
        stream2, store.dataset_dir, ["id"], checkpoint=ckpt2, seq_col="seq", app_id="app-x"
    )
    q2.awaitTermination(120)
    assert len(store.versions()) == n_versions, "replayed batches must be skipped"
    assert _read(ds_spark, store) == expected

    # new data after the replayed prefix still applies
    _write_cdc_files(ds_spark, src, [[(91, "fresh", 1.0, "i", 1)]])
    stream3 = (
        ds_spark.readStream.schema(CDC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q3 = apply_cdc_stream(
        stream3, store.dataset_dir, ["id"], checkpoint=ckpt1, seq_col="seq", app_id="app-x"
    )
    q3.awaitTermination(120)
    assert _read(ds_spark, store)[91] == ("fresh", 1.0)
