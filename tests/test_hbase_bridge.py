"""HBase-layout bridge: export/import round-trip in the reference layout."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def populated(store):
    """A dataset with two versions of one variable + a scalar."""
    a1 = np.arange(24, dtype="float64").reshape(4, 6)
    store.write_variable("temp", a1, chunk_shape=(2, 3))
    a2 = a1 * 2
    store.write_variable("temp", a2, chunk_shape=(2, 3))
    store.write_variable("answer", np.array(42.0), chunk_shape=())
    return store, a1, a2


def test_kv_layout_matches_reference(spark, populated):
    from mandoline_hbase_spark.sources.hbase_bridge import to_kv

    store, _, _ = populated
    kv = to_kv(store, spark, root="foo.bar.com")
    tables = {r.table for r in kv.select("table").distinct().collect()}
    # root-table-prefix reverses dot components (hbase.clj:346-361)
    assert tables == {
        "com.bar.foo.test-dataset.chunks",
        "com.bar.foo.test-dataset.indices",
        "com.bar.foo.test-dataset.versions",
    }
    # index row keys pack as "<var>|<c0/c1>|<version>" with "_" for scalars
    idx_keys = [
        r.rowkey
        for r in kv.filter(F.col("table").endswith(".indices")).collect()
    ]
    assert any(k.startswith("temp|0/0|") for k in idx_keys)
    assert any(k.startswith("answer|_|") for k in idx_keys)
    # chunks carry both qualifiers
    quals = {
        r.qualifier
        for r in kv.filter(F.col("table").endswith(".chunks")).collect()
    }
    assert quals == {"v", "r"}


def test_bridge_round_trip(spark, populated, tmp_path):
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.sources.hbase_bridge import from_kv, to_kv

    store, a1, a2 = populated
    kv = to_kv(store, spark)

    target = mk_schema(
        {"root": "import-testing.mandoline.io", "base_path": str(tmp_path / "import")}
    )
    conn2 = from_kv(kv, target, "restored")

    # both versions readable, identical to the source arrays
    versions = sorted(int(v["version"]) for v in conn2.versions())
    assert len(versions) == 3
    assert np.array_equal(conn2.read_variable("temp", version=versions[0]), a1)
    assert np.array_equal(conn2.read_variable("temp"), a2)
    assert conn2.read_variable("answer") == 42.0

    # content addressing survives: same chunk ids both sides
    src_ids = {r.chunk_id for r in store.spark_table("chunks", spark).collect()}
    dst_ids = {r.chunk_id for r in conn2.spark_table("chunks", spark).collect()}
    assert dst_ids == src_ids


def test_import_driver_state_is_o1(spark, populated, tmp_path, monkeypatch):
    """from_kv must never funnel chunk payloads or index rows through the
    driver: executors append the chunk/index log records; only the tiny
    versions table (one row per commit) is replayed driver-side."""
    from pyspark.sql import DataFrame

    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.sources.hbase_bridge import from_kv, to_kv

    store, a1, a2 = populated
    kv = to_kv(store, spark)
    target = mk_schema(
        {"root": "import-o1.mandoline.io", "base_path": str(tmp_path / "imp2")}
    )

    real_collect, real_topandas = DataFrame.collect, DataFrame.toPandas

    def gated_collect(self, *a, **k):
        # only the versions frame (3 commits) may come to the driver
        rows = real_collect(self, *a, **k)
        assert len(rows) <= 3, "oversized driver collect in from_kv"
        return rows

    def no_topandas(self, *a, **k):
        raise AssertionError("toPandas in the import path")

    monkeypatch.setattr(DataFrame, "collect", gated_collect)
    monkeypatch.setattr(DataFrame, "toPandas", no_topandas)
    conn2 = from_kv(kv, target, "restored-o1")
    monkeypatch.undo()
    assert np.array_equal(conn2.read_variable("temp"), a2)
    assert np.array_equal(conn2.read_variable("temp", version=sorted(
        int(v["version"]) for v in conn2.versions())[0]), a1)
