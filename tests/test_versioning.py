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
