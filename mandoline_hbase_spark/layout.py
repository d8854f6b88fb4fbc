"""Physical-layout maintenance for record variables: re-clustering and
small-chunk compaction (the OPTIMIZE / OPTIMIZE ... CLUSTER BY analog).

Zone maps (``zonemaps.py``) only skip chunks when the data is laid out
so that filter columns have tight per-chunk ranges. Ingest order rarely
is — so these helpers rewrite a record variable's layout as a NEW
version:

- :func:`cluster_records` — range-repartition on the cluster columns
  and rewrite, giving each chunk a tight, near-disjoint range on those
  columns (Delta ``OPTIMIZE ... ZORDER/CLUSTER BY`` for one key set).
- :func:`compact_records` — bin small chunks into ``target_rows``-sized
  ones (the small-files problem of streaming/CDC ingest: every
  micro-batch merge appends a chunk; compaction folds them back).

Both are expressed through the existing data-source read and
overwrite-write paths, so they inherit the full commit protocol:
executor-side chunk writes with fresh zone-map sidecars, tombstoned old
coordinates, a single atomic version append — and MVCC time travel
still reads every pre-rewrite version (content-addressed chunks are
never deleted by the rewrite; ``gc_chunks`` reclaims them once
retention drops the old versions).

Cost is one full read + write of the variable — a deliberate,
user-invoked rewrite, distributed across executors, with O(chunks)
driver state like every other commit.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _load_records(spark: SparkSession, dataset_path: str, variable: str):
    return (
        spark.read.format("mandoline")
        .option("path", dataset_path)
        .option("variable", variable)
        .option("form", "records")
        .load()
    )


def _overwrite_records(
    df, dataset_path: str, variable: str, bloom_columns: list[str] | None = None
) -> None:
    """Overwrite-rewrite with CLOBBER DETECTION: a layout rewrite reads
    the table, rewrites it, and replaces every coordinate — a writer
    committing in between would be silently reverted. The rewrite can't
    hold the dataset lock across a Spark job (the commit itself takes
    it), so conflicts are detected post-commit and raised: the rewrite
    version is rolled back by re-running it, and the interleaved commits
    remain intact in history (MVCC — nothing was destroyed, the rewrite
    version just must not win)."""
    import os

    from mandoline_hbase_spark.engine import Connection
    from mandoline_hbase_spark.errors import CommitConflictError

    conn = Connection(dataset_path, os.path.basename(dataset_path))
    planned_head = conn.latest_version_id()
    w = (
        df.write.format("mandoline")
        .option("path", dataset_path)
        .option("variable", variable)
        .mode("overwrite")
    )
    if bloom_columns:
        w = w.option("bloom_columns", ",".join(bloom_columns))
    w.save()
    committed = conn.latest_version_id()
    interleaved = [
        int(v["version"])
        for v in conn.versions()
        if planned_head is not None
        and planned_head < int(v["version"]) < committed
    ]
    if interleaved:
        raise CommitConflictError(
            f"layout rewrite planned at version {planned_head} but versions "
            f"{interleaved} committed concurrently and were superseded by the "
            f"rewrite at {committed}; roll back to {max(interleaved)} "
            "(versioning.rollback_variable) and re-run the rewrite"
        )


def cluster_records(
    spark: SparkSession,
    dataset_path: str,
    cluster_by: list[str],
    variable: str = "records",
    n_chunks: int | None = None,
    target_rows: int = 100_000,
    bloom_columns: list[str] | None = None,
) -> dict:
    """Rewrite the variable range-clustered on ``cluster_by``; returns
    {"rows": n, "n_chunks": k}. After this, zone-map pruning on the
    cluster columns is maximally effective (near-disjoint ranges);
    ``bloom_columns`` additionally builds per-chunk bloom filters for
    equality skipping on OTHER, unclustered columns."""
    if not cluster_by:
        raise ValueError("cluster_by must be non-empty")
    df = _load_records(spark, dataset_path, variable)
    missing = [c for c in cluster_by if c not in df.columns]
    if missing:
        raise ValueError(f"cluster columns not in record schema: {missing}")
    n = df.count()
    k = n_chunks or max(1, math.ceil(n / max(1, target_rows)))
    # range partitioning samples the keys and assigns contiguous ranges:
    # each output chunk covers a tight [lo, hi] of the cluster columns
    _overwrite_records(
        df.repartitionByRange(k, *cluster_by).sortWithinPartitions(*cluster_by),
        dataset_path,
        variable,
        bloom_columns,
    )
    return {"rows": int(n), "n_chunks": int(k)}


def compact_records(
    spark: SparkSession,
    dataset_path: str,
    variable: str = "records",
    target_rows: int = 100_000,
    bloom_columns: list[str] | None = None,
) -> dict:
    """Fold many small chunks (streaming/CDC append debris) into
    ``target_rows``-sized ones; returns {"rows": n, "n_chunks": k}.
    Round-robin repartition — no clustering opinion; compose with
    :func:`cluster_records` when a sort order is wanted too."""
    df = _load_records(spark, dataset_path, variable)
    n = df.count()
    k = max(1, math.ceil(n / max(1, target_rows)))
    _overwrite_records(df.repartition(k), dataset_path, variable, bloom_columns)
    return {"rows": int(n), "n_chunks": int(k)}


def zorder_cluster_records(
    spark: SparkSession,
    dataset_path: str,
    col_a: str,
    col_b: str,
    variable: str = "records",
    n_chunks: int | None = None,
    target_rows: int = 100_000,
    bits: int = 16,
    bloom_columns: list[str] | None = None,
) -> dict:
    """Two-dimensional clustering: rewrite range-partitioned on the
    Morton (Z-order) key of two non-negative integer columns, so every
    chunk covers a tight box in BOTH dimensions and zone maps prune
    point/range predicates on EITHER column — lexicographic
    ``cluster_records([a, b])`` only ever prunes on the leading column.
    The key is pure shift/mask column arithmetic (whole-stage codegen);
    the one shuffle is the range partitioning every clustering rewrite
    pays.

    Both columns are QUANTIZED onto a common ``bits``-wide grid before
    interleaving (``sources.lake.quantized_zorder_key`` — see its
    docstring for the mismatched-domain degeneration this prevents);
    quantization affects ordering only, never output rows. The key
    bounds and the row count come from ONE pre-scan aggregate. An empty
    variable (or an all-NULL key column) rewrites unkeyed — nothing to
    cluster, never a crash."""
    from mandoline_hbase_spark.sources.lake import quantized_zorder_key

    df = _load_records(spark, dataset_path, variable)
    for c in (col_a, col_b):
        if c not in df.columns:
            raise ValueError(f"z-order column {c!r} not in record schema")
    key, n = quantized_zorder_key(df, col_a, col_b, bits)
    k = n_chunks or max(1, math.ceil(n / max(1, target_rows)))
    if key is None:
        clustered = df.repartition(k)
    else:
        clustered = (
            df.withColumn("_zkey", key)
            .repartitionByRange(k, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey")
        )
    _overwrite_records(clustered, dataset_path, variable, bloom_columns)
    return {"rows": int(n), "n_chunks": int(k)}
