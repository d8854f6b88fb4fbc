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
    """Executors bake the ref count into the payload row (one ref per
    index entry referencing the chunk); the committed write has exact ref
    counts and GC keeps everything. A job that dies before the version-row
    append leaves rows tagged with a never-committed version — invisible
    to reads, reclaimed by sweep_failed_commits + gc_chunks."""
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


def test_distributed_ingest_driver_state_is_o1(spark, store, monkeypatch):
    """The array ingest path must never funnel per-chunk state through the
    driver: no DataFrame.collect()/toPandas() anywhere in the write — a
    variable with millions of chunks commits with O(1) driver memory
    (executors write payloads, refs and index rows; the driver appends
    only the version row)."""
    import numpy as np
    from pyspark.sql import DataFrame

    def _no_collect(self, *a, **k):
        raise AssertionError("driver-side collect() in the distributed write path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    monkeypatch.setattr(DataFrame, "toPandas", _no_collect)

    arr = np.arange(48, dtype="float64").reshape(6, 8)
    df = spark.createDataFrame(_tidy_rows(arr), "d0 long, d1 long, value double")
    vid = store.write_variable_from_df(
        df, "o1_var", shape=(6, 8), chunk_shape=(2, 4), dtype="float64"
    )
    monkeypatch.undo()
    out = store.read_variable("o1_var", version=vid)
    assert np.array_equal(out, arr)


def test_distributed_ingest_crash_before_commit_is_invisible(spark, store):
    """Rows tagged with a reserved-but-never-committed version are
    invisible to reads and reclaimed by sweep_failed_commits + gc."""
    import numpy as np
    from pyspark.sql import functions as F

    store.spark = spark
    arr = np.arange(24, dtype="float64").reshape(4, 6)
    df = spark.createDataFrame(_tidy_rows(arr), "d0 long, d1 long, value double")
    vid = store.write_variable_from_df(
        df, "crashy", shape=(4, 6), chunk_shape=(2, 3), dtype="float64"
    )

    # simulate a crashed second job: executor-side writes landed (index
    # rows + ref-carrying payloads at a reserved id), version row did not
    from mandoline_hbase_spark import storage as st

    crash_vid = store._reserve_version()
    seq = st.next_seq()
    st.append_rows(
        store._dirs["indices"],
        st.INDICES_SCHEMA,
        [
            {
                "var_name": "crashy",
                "coord_id": "9/9",
                "coord": [9, 9],
                "version_id": crash_vid,
                "chunk_id": "deadbeef",
                "seq": seq,
            }
        ],
    )
    st.append_rows(
        store._dirs["chunks"],
        st.CHUNKS_SCHEMA,
        [{"chunk_id": "deadbeef", "ref_delta": 1, "data": b"\x00" * 16}],
    )

    # invisible: reads at the latest committed bound resolve only vid
    assert np.array_equal(store.read_variable("crashy", version=vid), arr)
    assert store.latest_version_id() == vid

    swept = store.sweep_failed_commits(older_than_s=0.0)
    assert swept["index_rows_dropped"] == 1
    assert swept["refs_released"] == 1
    assert swept["reservations_cleared"] == 1
    gc = store.gc_chunks()
    assert gc["chunks_removed"] == 1  # the orphaned payload is gone
    assert np.array_equal(store.read_variable("crashy", version=vid), arr)
