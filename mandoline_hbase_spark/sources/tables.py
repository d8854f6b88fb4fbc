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
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The events fixture has stored ``ts`` as TIMESTAMP(NANOS) (which the
        # Spark parquet reader rejects) in some corpus generations and as
        # TIMESTAMP(MICROS) — sometimes without timezone (TIMESTAMP_NTZ) — in
        # others. Read with nanosAsLong enabled so the nanos variant surfaces
        # as int64, then normalize every variant to TIMESTAMP (micros, UTC
        # session tz): a long column is nanos → truncate to micros (what
        # DuckDB does, so oracle comparisons stay bit-equal); an NTZ column is
        # reinterpreted in the UTC session timezone, which preserves the
        # stored micros value exactly.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
