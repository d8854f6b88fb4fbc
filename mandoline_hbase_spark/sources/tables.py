"""Parquet table loaders for the driver's test corpus.

The corpus (``/root/testdata/sf*/``) is a TPC-H-ish star schema plus
``events`` (streaming fixture), ``documents`` (text/dedup fixture) and
``embeddings`` (similarity fixture). One parquet file per table.

Reads go through ``spark.read.parquet`` so Catalyst performs column
pruning and predicate pushdown into the scan — at 100 TB these tables
would be directory-partitioned and the same code would prune partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table, normalizing timestamp storage variants.

    Corpus generations have stored timestamps three ways: TIMESTAMP(NANOS)
    (which the Spark parquet reader rejects outright), TIMESTAMP(MICROS)
    with timezone, and TIMESTAMP(MICROS) without (surfacing as
    TIMESTAMP_NTZ — which then fails ``unix_micros`` and comparisons
    against TIMESTAMP literals in downstream queries). Normalize EVERY
    timestamp-ish column of EVERY table to TIMESTAMP (micros, UTC session
    tz): a nanos column is read as int64 (nanosAsLong) and truncated to
    micros — exactly what DuckDB does, so oracle comparisons stay
    bit-equal; an NTZ column is reinterpreted in the UTC session
    timezone, preserving the stored micros value exactly.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # int64-surfaced nanos only ever occurs for the events ``ts`` column
    # (nanosAsLong gives no marker distinguishing real longs from nanos,
    # so only the known-timestamp column is converted).
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
