"""Bucketed materialization: shuffle-free co-located joins for tables
that are joined repeatedly on the same key.

A 100 TB pipeline joins the same big artifacts over and over — postings
with doc lengths, features with candidate pairs, fact with fact. Every
such join pays a full shuffle of both sides unless the storage layout
already agrees with the join key. Spark's answer is BUCKETING
(hash-partitioned, optionally sorted files registered in the catalog):
two tables bucketed into the same number of buckets on the join key
join with ZERO Exchange — and with ``sortBy``, zero Sort — so the cost
of the shuffle is paid once at write time and amortized over every
subsequent join, the same trade as Hive SMB joins and Iceberg's
bucket transform.

These helpers wrap that surface with the repo's conventions: identical
bucket counts enforced up front (mismatched counts silently fall back
to shuffling one side), deterministic writes, and a plan probe used by
tests and operators to ASSERT the exchange really disappeared rather
than trusting configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table,
    replacing any previous version; returns the re-read table.

    ``sort_cols`` defaults to ``bucket_cols``. Spark's v1 planner does
    not consume the sort order on read (the merge join re-sorts within
    buckets), but sorted single-file buckets still buy columnar
    compression, parquet min/max locality, and readiness for engines
    that do SMB reads.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    missing = [c for c in bucket_cols if c not in df.columns]
    if missing:
        raise ValueError(f"bucket columns not in schema: {missing}")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed earlier write can leave the managed location behind with
    # no catalog entry; Spark then refuses the name outright
    # (LOCATION_ALREADY_EXISTS) — clear the orphan dir, local/file only.
    # The managed location depends on the database: warehouse/<t> for
    # default, warehouse/<db>.db/<t> otherwise; guessing wrong would
    # rmtree a LIVE table's data, so only the shapes we can derive
    # exactly are cleaned (same-named dot-qualified forms get no
    # cleanup and may still raise LOCATION_ALREADY_EXISTS).
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    parts = [p.lower() for p in table_name.split(".")]
    if wh.scheme in ("", "file") and wh.path and len(parts) <= 2:
        if len(parts) == 1:
            parts = [spark.catalog.currentDatabase().lower(), parts[0]]
        db, tbl = parts
        orphan = (
            os.path.join(wh.path, tbl)
            if db == "default"
            else os.path.join(wh.path, f"{db}.db", tbl)
        )
        if os.path.isdir(orphan):
            shutil.rmtree(orphan, ignore_errors=True)
    (
        # repartition on the bucket key first: ONE file per bucket.
        # Spark only trusts bucket sort order (and drops the merge-join
        # Sort) when a bucket is a single file; many files per bucket
        # keep the bucketed Exchange elimination but re-sort.
        df.repartition(n_buckets, *bucket_cols)
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def bucketed_equi_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    Callers are expected to have written both sides through
    :func:`materialize_bucketed` with the SAME ``n_buckets`` over
    ``on``; the returned plan then contains no Exchange for either
    side (verify with :func:`exchange_count` — Spark falls back to
    shuffling silently when the layouts disagree).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan —
    the metric bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
