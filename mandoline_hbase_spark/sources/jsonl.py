"""Sharded JSONL export/import — the training-data delivery format.

Most LLM training stacks consume newline-delimited JSON shards of
roughly even size. Export here is deterministic: every row is assigned
a shard by a hash of its id (stable across runs and cluster sizes, so
re-exports are reproducible and resumable), then written one file per
shard via ``partitionBy`` — each shard directory holds exactly the rows
whose hash lands there, independent of input partitioning.

At 100 TB: the single shuffle is the repartition onto shard keys;
shard count should target 100 MB–1 GB of compressed JSONL per shard
(``n_shards = ceil(total_bytes / target_bytes)``) so downstream
loaders stream shards whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def shard_assignment(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Add a deterministic ``shard`` column: ``xxhash64(id) mod n_shards``.

    Hash-based (not round-robin) so the same row always lands in the same
    shard regardless of input split order or parallelism.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Write ``path/shard=K/*.json`` — one JSONL file per shard.

    ``repartition("shard")`` puts each shard's rows in one task, so each
    shard directory holds a single file without coalescing to 1 task
    globally — writes stay parallel across shards.
    """
    sharded = shard_assignment(df, n_shards, id_col)
    sharded.repartition(n_shards, "shard").write.mode(mode).partitionBy(
        "shard"
    ).json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a sharded JSONL export back; `shard` returns as a partition column."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
