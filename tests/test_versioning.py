"""Version-diff semantics: coord-level and cell-level, grow/update."""

from __future__ import annotations

import numpy as np

from mandoline_hbase_spark import versioning


def test_changed_coords_update_region(spark, store):
    arr = np.zeros((4, 6), dtype=np.float64)
    v1 = store.write_variable("v", arr, chunk_shape=(2, 3))
    v2 = store.update_region("v", np.ones((2, 3)), offset=(0, 0))
    out = versioning.changed_coords(store, "v", v1, v2, spark=spark).collect()
    # exactly the one rewritten chunk (0,0)
    assert len(out) == 1
    assert out[0].change == "rewritten" and out[0].coord_id == "0/0"


def test_changed_coords_dedup_identical_rewrite(spark, store):
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    v1 = store.write_variable("v", arr, chunk_shape=(3, 4))
    v2 = store.write_variable("v", arr.copy(), chunk_shape=(3, 4))
    # content-addressed: byte-identical rewrite is NOT a change
    assert versioning.changed_coords(store, "v", v1, v2, spark=spark).count() == 0


def test_cell_diff_changed_values_only(spark, store):
    arr = np.zeros((2, 4), dtype=np.float64)
    v1 = store.write_variable("v", arr, chunk_shape=(2, 2))
    patch = np.array([[5.0, 0.0], [0.0, 7.0]])
    v2 = store.update_region("v", patch, offset=(0, 0))
    rows = versioning.diff_versions(store, "v", v1, v2, spark=spark).collect()
    got = {(r.dim0, r.dim1): (r.value_old, r.value_new, r.change) for r in rows}
    # only the two cells whose values actually moved (zeros stayed zeros)
    assert got == {
        (0, 0): (0.0, 5.0, "changed"),
        (1, 1): (0.0, 7.0, "changed"),
    }


def test_cell_diff_grow_marks_added(spark, store):
    v1 = store.write_variable("v", np.ones((2, 2)), chunk_shape=(2, 2))
    v2 = store.update_region("v", np.full((2, 2), 2.0), offset=(0, 2))  # grow
    rows = versioning.diff_versions(store, "v", v1, v2, spark=spark).collect()
    added = {(r.dim0, r.dim1) for r in rows if r.change == "added"}
    assert added == {(0, 2), (0, 3), (1, 2), (1, 3)}
    assert all(r.value_new == 2.0 for r in rows if r.change == "added")
    assert not [r for r in rows if r.change in ("changed", "removed")]


def test_clone_dataset_snapshot(spark, tmp_path):
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark import versioning

    schema = mk_schema(
        {"root": "clone.example.com", "base_path": str(tmp_path)}, spark=spark
    )
    schema.create_dataset("src")
    src = schema.connect("src")
    a1 = np.arange(24, dtype=np.float64).reshape(4, 6)
    v1 = src.write_variable("temp", a1, chunk_shape=(2, 3))
    src.write_variable("press", np.ones((2, 2)), chunk_shape=(2, 2))
    v2_arr = np.full((4, 6), 9.0)
    src.write_variable("temp", v2_arr, chunk_shape=(2, 3))

    # clone at the FIRST temp version: dst sees v1's temp, no press yet
    out = versioning.clone_dataset(schema, "src", "at_v1", version=v1, spark=spark)
    dst = schema.connect("at_v1")
    assert (dst.read_variable("temp") == a1).all()
    assert out["variables"] == {"temp": 4}  # 4x6 in (2,3) chunks = 2x2 grid

    # clone at latest: both variables, temp at its newest values
    versioning.clone_dataset(schema, "src", "at_head", spark=spark)
    head = schema.connect("at_head")
    assert (head.read_variable("temp") == v2_arr).all()
    assert (head.read_variable("press") == np.ones((2, 2))).all()


def test_clone_survives_source_gc(spark, tmp_path):
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark import versioning

    schema = mk_schema(
        {"root": "clone.example.com", "base_path": str(tmp_path)}, spark=spark
    )
    schema.create_dataset("src")
    src = schema.connect("src")
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    v1 = src.write_variable("v", arr, chunk_shape=(2, 2))
    src.write_variable("v", np.zeros((4, 4)), chunk_shape=(2, 2))

    versioning.clone_dataset(schema, "src", "snap", version=v1, spark=spark)

    # retain only the newest source version and reclaim dead chunks
    src.prune_versions(keep_last=1)
    src.gc_chunks()

    snap = schema.connect("snap")
    assert (snap.read_variable("v") == arr).all()


def test_rollback_variable_restores_old_values(spark, store):
    a1 = np.arange(24, dtype=np.float64).reshape(4, 6)
    v1 = store.write_variable("v", a1, chunk_shape=(2, 3))
    store.write_variable("v", np.zeros((4, 6)), chunk_shape=(2, 3))
    v3 = versioning.rollback_variable(store, "v", v1, spark=spark)
    # latest now reads the v1 data; the bad commit stays readable
    assert (store.read_variable("v") == a1).all()
    assert (store.read_variable("v", version=v3) == a1).all()
    assert (store.read_variable("v", version=v1) == a1).all()


def test_rollback_adds_references_so_gc_keeps_blobs(spark, tmp_path):
    from mandoline_hbase_spark.engine import mk_schema

    schema = mk_schema(
        {"root": "rb.example.com", "base_path": str(tmp_path)}, spark=spark
    )
    schema.create_dataset("ds")
    conn = schema.connect("ds")
    a1 = np.full((2, 2), 3.0)
    v1 = conn.write_variable("v", a1, chunk_shape=(2, 2))
    conn.write_variable("v", np.full((2, 2), 4.0), chunk_shape=(2, 2))
    versioning.rollback_variable(conn, "v", v1, spark=spark)
    # retention keeps only the newest version (the rollback); its chunks
    # must survive GC because the rollback re-referenced them
    conn.prune_versions(keep_last=1)
    conn.gc_chunks()
    assert (conn.read_variable("v") == a1).all()
