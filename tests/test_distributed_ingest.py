"""Distributed ingest: write_variable_from_df vs the driver-side path."""

from __future__ import annotations

import numpy as np


def _tidy_rows(arr: np.ndarray):
    rows = []
    for idx in np.ndindex(arr.shape):
        rows.append((*[int(i) for i in idx], float(arr[idx])))
    return rows


def test_distributed_write_round_trip(spark, store):
    arr = np.arange(48, dtype="float64").reshape(6, 8)
    df = spark.createDataFrame(_tidy_rows(arr), "d0 long, d1 long, value double")
    vid = store.write_variable_from_df(
        df, "temp", shape=(6, 8), chunk_shape=(2, 4), dtype="float64"
    )
    out = store.read_variable("temp", version=vid)
    assert np.array_equal(out, arr)


def test_distributed_matches_driver_chunk_ids(spark, store):
    """Both write paths must produce byte-identical blocks -> the SAME
    content-addressed chunk ids, so dedup works across paths."""
    arr = np.arange(24, dtype="float64").reshape(4, 6)
    store.write_variable("a_driver", arr, chunk_shape=(2, 3))
    df = spark.createDataFrame(_tidy_rows(arr), "d0 long, d1 long, value double")
    store.write_variable_from_df(
        df, "a_dist", shape=(4, 6), chunk_shape=(2, 3), dtype="float64"
    )
    chunks = store.spark_table("chunks", spark)
    # every distinct payload appears under exactly one chunk_id, and the
    # distributed variable introduced no new ids beyond the driver write
    ids = [r.chunk_id for r in chunks.select("chunk_id").distinct().collect()]
    per_var = {}
    for var in ("a_driver", "a_dist"):
        per_var[var] = {
            r.chunk_id
            for r in store.spark_table("indices", spark)
            .filter(f"var_name = '{var}'")
            .select("chunk_id")
            .distinct()
            .collect()
        }
    assert per_var["a_driver"] == per_var["a_dist"]
    assert set(ids) == per_var["a_driver"]


def test_distributed_write_sparse_fill(spark, store):
    """Cells absent from the tidy frame read back as fill (NaN)."""
    df = spark.createDataFrame(
        [(0, 0, 1.0), (3, 5, 2.0)], "d0 long, d1 long, value double"
    )
    vid = store.write_variable_from_df(
        df, "sparse", shape=(4, 6), chunk_shape=(2, 3), dtype="float64"
    )
    out = store.read_variable("sparse", version=vid)
    assert out[0, 0] == 1.0 and out[3, 5] == 2.0
    mask = np.ones((4, 6), dtype=bool)
    mask[0, 0] = mask[3, 5] = False
    assert np.isnan(out[mask]).all()


def test_distributed_ingest_refs_granted_at_commit(spark, store):
    """Executor-appended payload rows carry ref 0; the driver commit
    grants the refs — so a job that dies before commit leaves only
    GC-reclaimable chunks, and a committed write has exact ref counts."""
    import numpy as np
    from pyspark.sql import functions as F

    store.spark = spark
    n = 8
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("d0"),
            (F.col("id") % n).alias("d1"),
            F.lit(1.0).alias("value"),  # identical blocks -> one chunk, 4 refs
        )
    )
    store.write_variable_from_df(df, "u", shape=(n, n), chunk_shape=(4, 4), dim_cols=["d0", "d1"])
    cmap = store.resolve_chunk_map("u", store.latest_version_id())
    assert len(set(cmap.values())) == 1  # content addressing collapsed
    the_chunk = next(iter(cmap.values()))
    assert store.chunk_store().chunk_refs(the_chunk) == 4  # one per coord
    assert store.gc_chunks()["chunks_removed"] == 0
