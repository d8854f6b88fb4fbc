"""Lake layout helpers: partitioned and bucketed parquet tables.

At 100 TB the physical layout IS the query plan:

- **Partition columns** (directory-level) give partition PRUNING — a
  filter on the partition column skips whole directories before any IO.
  Partition by coarse, low-cardinality attributes (date, region).
- **Bucketing** (file-level hash layout, via ``saveAsTable``) gives
  SHUFFLE-FREE joins and aggregations on the bucket key: two tables
  bucketed identically join without an Exchange on either side.

This module mirrors the decision the survey records for the storage
layer (SURVEY §4: chunk_index partitioned/z-ordered by (var_name,
coord) keeps the latest-<=-version scan pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet partitioned by directory columns (pruning layout)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table (bucket metadata needs the catalog;
    plain .parquet() paths cannot carry it)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table_name)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
