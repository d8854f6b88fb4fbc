"""Distributed read path: chunk_map_df + tidy_view (SURVEY §3.3 Spark win)."""

from __future__ import annotations

import numpy as np


def test_chunk_map_df_matches_driver_resolution(spark, store):
    arr = np.arange(64, dtype=np.float64).reshape(8, 8)
    v1 = store.write_variable("x", arr, chunk_shape=(4, 4))
    store.update_region("x", np.full((4, 4), -1.0), offset=(0, 0))
    v2 = store.latest_version_id()

    for bound in (v1, v2):
        spark_map = {
            r["coord_id"]: r["chunk_id"]
            for r in store.chunk_map_df("x", bound, spark).collect()
        }
        assert spark_map == store.resolve_chunk_map("x", bound)
    # the overwritten coord resolves differently across snapshots
    assert store.resolve_chunk_map("x", v1)["0/0"] != store.resolve_chunk_map("x", v2)["0/0"]


def test_tidy_view_round_trip(spark, store):
    arr = np.arange(30, dtype=np.float64).reshape(5, 6)
    store.write_variable("t", arr, chunk_shape=(2, 4))
    pdf = store.tidy_view("t", spark=spark).toPandas()
    assert len(pdf) == 30  # out-of-bounds pad cells trimmed
    dense = np.full((5, 6), np.nan)
    dense[pdf["dim0"], pdf["dim1"]] = pdf["value"]
    np.testing.assert_array_equal(dense, arr)


def test_tidy_view_snapshot(spark, store):
    a1 = np.zeros((4, 4), dtype=np.float64)
    v1 = store.write_variable("s", a1, chunk_shape=(2, 2))
    store.update_region("s", np.ones((2, 2)), offset=(1, 1))
    pdf1 = store.tidy_view("s", version=v1, spark=spark).toPandas()
    assert (pdf1["value"] == 0).all()
    pdf2 = store.tidy_view("s", spark=spark).toPandas()
    dense = np.zeros((4, 4))
    dense[pdf2["dim0"], pdf2["dim1"]] = pdf2["value"]
    assert dense[1:3, 1:3].sum() == 4 and dense.sum() == 4


def test_tidy_view_region_matches_numpy_slice(spark, store):
    import numpy as np

    store.spark = spark
    arr = np.arange(144, dtype=np.float64).reshape(12, 12)
    store.write_variable("v", arr, chunk_shape=(4, 4))
    region = ((2, 7), (5, 11))
    rows = store.tidy_view("v", region=region).collect()
    got = {(r.dim0, r.dim1): r.value for r in rows}
    expect = {
        (i, j): arr[i, j]
        for i in range(2, 7)
        for j in range(5, 11)
    }
    assert got == expect


def test_tidy_view_region_pushes_coord_filter_to_scan(spark, store):
    """The region's chunk coord_ids must reach the parquet index scan as a
    pushed filter — the distributed analog of the reference's bounded
    start/stop-row scan (hbase.clj:191-192)."""
    import numpy as np

    store.spark = spark
    arr = np.ones((16, 16), dtype=np.float64)
    store.write_variable("v", arr, chunk_shape=(4, 4))  # 16 chunks
    df = store.tidy_view("v", region=((0, 4), (0, 4)))  # 1 chunk
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "coord_id" in plan and "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "coord_id" in ln]
    assert pushed, plan
    assert len(df.collect()) == 16  # 4x4 cells of the single chunk


def test_cross_variable_join_analytics(spark, store):
    """Two variables in one dataset, independently versioned, joined on
    their dimension columns — the array-store analog of a relational
    join, fully distributed through two tidy views."""
    import numpy as np
    from pyspark.sql import functions as F

    store.spark = spark
    rng = np.random.default_rng(3)
    temp = rng.uniform(10, 30, size=(6, 8))
    humid = rng.uniform(0, 1, size=(6, 8))
    store.write_variable("temperature", temp, chunk_shape=(3, 4))
    store.write_variable("humidity", humid, chunk_shape=(2, 8))  # different chunking

    t = store.tidy_view("temperature").withColumnRenamed("value", "t")
    h = store.tidy_view("humidity").withColumnRenamed("value", "h")
    joined = t.join(h, ["dim0", "dim1"])
    assert joined.count() == 48

    # heat index-ish derived field, checked cell-exact against numpy
    out = {
        (r.dim0, r.dim1): r.hi
        for r in joined.select(
            "dim0", "dim1", (F.col("t") + 5.0 * F.col("h")).alias("hi")
        ).collect()
    }
    for i in range(6):
        for j in range(8):
            assert abs(out[(i, j)] - (temp[i, j] + 5.0 * humid[i, j])) < 1e-12

    # writing one variable must not disturb the other's latest read
    store.write_variable("humidity", humid * 2, chunk_shape=(2, 8))
    assert np.allclose(store.read_variable("temperature"), temp)
    assert np.allclose(store.read_variable("humidity"), humid * 2)
    meta = store.metadata(store.latest_version_id())
    assert set(meta["variables"]) == {"temperature", "humidity"}


def test_loaders_normalize_ntz_timestamp_corpus(spark, tmp_path):
    """Corpus regenerations have flipped timestamp columns between
    LTZ/NTZ/nanos; every variant must load as plain TIMESTAMP so
    timestamp-literal comparisons and unix_micros keep working."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mandoline_hbase_spark.queries.catalog import QUERIES
    from mandoline_hbase_spark.sources.tables import TABLES, load_table
    from tests.conftest import SF_SMOKE

    for t in TABLES:
        tbl = pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet"))
        fields = [
            pa.field(f.name, pa.timestamp(f.type.unit))
            if pa.types.is_timestamp(f.type)
            else f
            for f in tbl.schema
        ]
        pq.write_table(tbl.cast(pa.schema(fields)), str(tmp_path / f"{t}.parquet"))

    # every timestamp column surfaces as TIMESTAMP (not NTZ)
    for t in ("orders", "lineitem", "events"):
        for f in load_table(spark, str(tmp_path), t).schema.fields:
            assert f.dataType.typeName() != "timestamp_ntz", (t, f.name)
    # timestamp-literal filters and unix_micros paths run
    assert QUERIES["q1_pricing_summary"].fn(spark, str(tmp_path)).count() > 0
    assert QUERIES["sessionize_events"].fn(spark, str(tmp_path)).count() > 0
