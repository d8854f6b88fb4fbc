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

from mandoline_hbase_spark.operators.skew import spread_to_parallelism
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


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed token windows with overlap (context-window
    chunking): window i covers tokens ``[i*stride, i*stride + chunk_tokens)``;
    the final window is the remainder. ``stride < chunk_tokens`` gives the
    standard overlapping-context training chunks; ``stride == chunk_tokens``
    gives disjoint splits.

    Map-only until the explode (the token array is staged once per row —
    the lambda-capture discipline of PERFORMANCE.md); one output row per
    chunk with ``(doc_id, chunk_idx, chunk_text, n_tok)``. At 100 TB this
    pipelines into the scan: no shuffle, chunk rows flow straight to the
    packing/tokenizer stage. explode_outer + null filter keeps the
    inferred generate filter from inlining the window construction below
    the parallelizing exchange (see dedup.segment_hashes).
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    spread = spread_to_parallelism(df, id_col)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    staged = spread.withColumn("_ck_toks", toks)
    t = F.col("_ck_toks")
    # split(trim('')) yields [''] — an empty/whitespace-only doc has ZERO
    # tokens and must emit zero chunks, not one ''-chunk with n_tok 1
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(t))
    # number of windows: ceil(max(n - chunk + stride, 1) / stride) for n>0
    n_win = (
        F.when(n == 0, F.lit(0))
        .when(n <= chunk_tokens, F.lit(1))
        .otherwise(F.ceil((n - chunk_tokens).cast("double") / stride).cast("int") + 1)
    )
    wins = F.when(n_win == 0, F.array().cast("array<struct<chunk_idx:bigint,chunk_text:string,n_tok:bigint>>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.struct(
                i.cast("bigint").alias("chunk_idx"),
                F.concat_ws(" ", F.slice(t, i * stride + 1, chunk_tokens)).alias(
                    "chunk_text"
                ),
                F.least(n - i * stride, F.lit(chunk_tokens)).cast("bigint").alias("n_tok"),
            ),
        )
    )
    return (
        staged.withColumn("_ck_wins", wins)
        .select(F.col(id_col), F.explode_outer("_ck_wins").alias("w"))
        .filter(F.col("w").isNotNull())
        .select(
            F.col(id_col),
            F.col("w.chunk_idx").alias("chunk_idx"),
            F.col("w.chunk_text").alias("chunk_text"),
            F.col("w.n_tok").alias("n_tok"),
        )
    )
