"""Sequence packing: assign documents to fixed token-budget packs.

Training pipelines concatenate documents into fixed-length sequences
("packing") to avoid padding waste. The exact greedy global order is
inherently sequential, so the distributed form packs within hash
buckets: documents are salted into ``n_buckets`` streams, each stream
is filled greedily in deterministic ``id`` order, and a pack is the
(bucket, pack_seq) pair. Each bucket's cumulative sum is an independent
window — ``n_buckets`` controls parallelism (thousands at 100 TB keeps
every window partition executor-sized), and the assignment is fully
deterministic and engine-independent, so an identical SQL formulation
serves as the oracle.

Greedy-fill semantics: a document joins the pack its *exclusive*
running total falls in, so packs can overshoot the budget by at most
one document — the standard concat-then-chunk behavior, not exact bin
packing (which is NP-hard and order-dependent anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators.text import n_tokens


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc a ``(bucket, pack_seq)`` pack id.

    One shuffle (the per-bucket window sort). ``pack_seq`` is the
    exclusive running token total divided by the budget; docs larger
    than the budget occupy their own pack span.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = df.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).cast("bigint").alias("bucket"),
        n_tokens(F.col(text_col)).cast("bigint").alias("n_tok"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    running = F.sum("n_tok").over(w)  # inclusive of the current row
    return toks.select(
        id_col,
        "bucket",
        "n_tok",
        F.floor((running - F.col("n_tok")) / budget).cast("bigint").alias("pack_seq"),
    )


def pack_utilization(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill statistics — the metric packing exists to improve."""
    return (
        packed.groupBy("bucket", "pack_seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
        .withColumn("utilization", F.round(F.col("pack_tokens") / budget, 4))
    )
