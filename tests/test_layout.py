"""Layout maintenance: clustering makes zone-map pruning effective,
compaction folds small chunks, both preserve data + history (MVCC)."""

from __future__ import annotations

import pytest
from pyspark.sql.datasource import EqualTo

from mandoline_hbase_spark.layout import cluster_records, compact_records


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-layout-tests",
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
    schema.create_dataset("layout-ds")
    yield schema.connect("layout-ds")


def _write_scrambled(ds_spark, store, n=200):
    """Hash-partitioned ingest: every chunk spans the whole id range, so
    zone maps cannot prune anything."""
    df = ds_spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(n)], "id BIGINT, name STRING, score DOUBLE"
    )
    (
        df.repartition(4, "name")
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )


def _pruned_parts(store, filt):
    from mandoline_hbase_spark.sources.datasource import MandolinePruningBatchReader

    r = MandolinePruningBatchReader({"path": store.dataset_dir, "variable": "records"}, "records")
    r.pushFilters([filt])
    return len(r.partitions())


def _read_all(ds_spark, store):
    df = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )
    return sorted((r.id, r.name, r.score) for r in df.collect())


def test_cluster_records_enables_pruning(ds_spark, store):
    _write_scrambled(ds_spark, store)
    before = _read_all(ds_spark, store)
    assert _pruned_parts(store, EqualTo(("id",), 7)) == 4, "scrambled: nothing prunes"

    summary = cluster_records(
        ds_spark, store.dataset_dir, ["id"], target_rows=50
    )  # 200 rows -> 4 chunks
    assert summary == {"rows": 200, "n_chunks": 4}
    assert _read_all(ds_spark, store) == before, "rewrite must not change data"
    assert _pruned_parts(store, EqualTo(("id",), 7)) == 1, "clustered: point lookup = 1 chunk"


def test_cluster_preserves_time_travel(ds_spark, store):
    _write_scrambled(ds_spark, store, n=40)
    v_old = int(store.versions()[0]["version"])
    cluster_records(ds_spark, store.dataset_dir, ["id"], target_rows=10)
    df_old = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .option("version", v_old)
        .load()
    )
    assert df_old.count() == 40, "pre-rewrite snapshot stays readable"


def test_compact_records_folds_small_chunks(ds_spark, store):
    from mandoline_hbase_spark.sources.datasource import _snapshot

    # 8 tiny appends -> 8 chunks
    for i in range(8):
        (
            ds_spark.createDataFrame([(i, f"n{i}", float(i))], "id BIGINT, name STRING, score DOUBLE")
            .coalesce(1)
            .write.format("mandoline")
            .option("path", store.dataset_dir)
            .option("variable", "records")
            .mode("append")
            .save()
        )
    _, _, entries = _snapshot(store.dataset_dir, "records", None)
    assert len(entries) == 8
    before = _read_all(ds_spark, store)
    summary = compact_records(ds_spark, store.dataset_dir, target_rows=4)
    assert summary == {"rows": 8, "n_chunks": 2}
    _, _, entries = _snapshot(store.dataset_dir, "records", None)
    assert len(entries) == 2
    assert _read_all(ds_spark, store) == before


def test_cluster_rejects_unknown_column(ds_spark, store):
    _write_scrambled(ds_spark, store, n=10)
    with pytest.raises(ValueError, match="cluster columns"):
        cluster_records(ds_spark, store.dataset_dir, ["nope"])


def test_compact_stats_drops_orphans_keeps_pruning(ds_spark, store):
    """After a clustering rewrite + GC, sidecar rows of dead chunks are
    dropped and pruning still works for the live layout."""
    from mandoline_hbase_spark import maintenance, zonemaps
    from mandoline_hbase_spark.sources.datasource import _snapshot

    _write_scrambled(ds_spark, store, n=80)
    cluster_records(ds_spark, store.dataset_dir, ["id"], target_rows=20)
    store.prune_versions(keep_last=1, spark=ds_spark)
    maintenance.gc_chunks(store, ds_spark)
    s = maintenance.compact_stats(store, ds_spark)
    assert s["stats_removed"] > 0, "pre-rewrite chunk stats must be reclaimed"
    _, _, entries = _snapshot(store.dataset_dir, "records", None)
    cids = [cid for _, cid in entries]
    loaded = zonemaps.load_stats(store.dataset_dir + "/stats", cids)
    assert set(loaded) == set(cids), "live chunks keep their stats"
    assert _pruned_parts(store, EqualTo(("id",), 7)) == 1


def test_layout_rewrite_detects_interleaved_commit(ds_spark, store):
    """A commit landing between the rewrite's planning and its overwrite
    is detected and surfaced instead of silently reverted."""
    from mandoline_hbase_spark.errors import CommitConflictError
    from mandoline_hbase_spark.layout import _load_records, _overwrite_records
    from mandoline_hbase_spark.merge import merge_records

    _write_scrambled(ds_spark, store, n=20)
    df = _load_records(ds_spark, store.dataset_dir, "records")

    class InterferingDF:
        """Fires a concurrent merge the moment the rewrite starts writing."""

        def __init__(self, inner):
            self._inner = inner

        @property
        def write(self):
            merge_records(
                ds_spark, store.dataset_dir,
                ds_spark.createDataFrame(
                    [(999, "interloper", 0.0)], "id BIGINT, name STRING, score DOUBLE"
                ),
                ["id"],
            )
            return self._inner.write

    with pytest.raises(CommitConflictError, match="committed concurrently"):
        _overwrite_records(
            InterferingDF(df.repartition(2)), store.dataset_dir, "records"
        )
    # nothing destroyed: the interloper's version is still in history
    versions = [int(v["version"]) for v in store.versions()]
    assert len(versions) >= 3  # seed + interloper + rewrite


def test_zorder_cluster_prunes_both_dimensions(ds_spark, store):
    """Z-order clustering gives zone-map pruning on BOTH columns, where
    lexicographic clustering only prunes the leading one."""
    from mandoline_hbase_spark.layout import zorder_cluster_records

    rows = [(x * 32 + y, x, y) for x in range(32) for y in range(32)]
    (
        ds_spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT")
        .repartition(4, "id")  # scrambled
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    # lexicographic (x, y): y alone prunes nothing
    cluster_records(ds_spark, store.dataset_dir, ["x", "y"], n_chunks=16)
    lex_x = _pruned_parts(store, EqualTo(("x",), 5))
    lex_y = _pruned_parts(store, EqualTo(("y",), 5))
    assert lex_x <= 2 and lex_y == 16

    zorder_cluster_records(ds_spark, store.dataset_dir, "x", "y", n_chunks=16, bits=5)
    z_x = _pruned_parts(store, EqualTo(("x",), 5))
    z_y = _pruned_parts(store, EqualTo(("y",), 5))
    assert z_x <= 6 and z_y <= 6, (z_x, z_y)

    # data unchanged, filters exact
    df = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )
    assert df.count() == 1024
    assert df.filter("x = 5 AND y = 5").count() == 1


def test_zorder_cluster_handles_empty_and_all_null_columns(ds_spark, store):
    """Code-review r8: the bounds aggregate returns NULLs on an empty
    variable or an all-NULL z-order column — the rewrite must fall back
    to unkeyed chunks (nothing to cluster), never crash, and bits
    outside [1, 31] must fail loudly (bit 63 is the sign bit and
    quantized values always reach the top of the grid)."""
    import pytest as _pytest

    from mandoline_hbase_spark.layout import zorder_cluster_records

    (
        ds_spark.createDataFrame(
            [(1, None, 2.0), (2, None, 3.0)], "id BIGINT, x BIGINT, v DOUBLE"
        )
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    out = zorder_cluster_records(ds_spark, store.dataset_dir, "id", "x", n_chunks=2)
    assert out["rows"] == 2  # all-NULL dimension: rewrote unkeyed
    with _pytest.raises(ValueError, match=r"\[1, 31\]"):
        zorder_cluster_records(ds_spark, store.dataset_dir, "id", "v", bits=32)


def test_zorder_quantizes_mismatched_domain_widths(ds_spark, store):
    """r8 zorder-bench finding: interleaving RAW values whose domains
    differ in bit width hands the key's top bits entirely to the wider
    column — the layout silently degenerates to a lexicographic sort on
    it and the narrow column never prunes. The min/max quantization
    must keep both dimensions pruning: here a 15-bit id against a
    3-bit category."""
    from mandoline_hbase_spark.layout import zorder_cluster_records

    rows = [(i, i % 8, float(i)) for i in range(32768)]
    (
        ds_spark.createDataFrame(rows, "id BIGINT, cat BIGINT, v DOUBLE")
        .repartition(4, "v")  # scrambled ingest
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    zorder_cluster_records(
        ds_spark, store.dataset_dir, "id", "cat", n_chunks=16, bits=16
    )
    z_id = _pruned_parts(store, EqualTo(("id",), 12345))
    z_cat = _pruned_parts(store, EqualTo(("cat",), 3))
    # un-quantized interleaving gives z_cat == 16 (no pruning at all)
    assert z_id <= 6 and z_cat <= 10, (z_id, z_cat)
    df = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )
    assert df.count() == 32768
    assert df.filter("id = 12345 AND cat = 1").count() == 1
