"""Distributed BPE (byte-pair-encoding) vocabulary training.

Classic corpus-level BPE trains on the WORD-FREQUENCY table, not the
corpus: the heavy pass is one groupBy building ``(word, freq)``; every
merge iteration then works on the vocabulary grain (distinct words),
which is bounded (Heaps' law) no matter how large the corpus. That is
exactly the shape that scales: a 100 TB corpus and a 100 GB corpus have
vocabularies within an order of magnitude.

Per merge iteration: one pair-count aggregation over the vocab table
(weighted by word freq), one driver argmax of a single row (count desc,
pair lexicographic asc — deterministic), one map-only rewrite of the
token arrays (greedy LEFT-TO-RIGHT adjacent merge via a fold, the same
semantics as reference BPE implementations), then ``localCheckpoint``
to truncate lineage. The driver never holds more than one best-pair
row; merges stop early when no pair repeats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mandoline_hbase_spark.plans.audit import checkpoint_audited


def _merge_adjacent(tokens_col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into ``a+b``:
    fold that either extends the output or replaces its last element.
    Matches the sequential semantics of scalar BPE (``aaa`` with merge
    (a,a) -> [aa, a])."""
    merged = F.lit(a + b)
    return F.aggregate(
        tokens_col,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (t == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale pass."""
    return (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_fit(
    df: DataFrame, n_merges: int = 20, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.

    Returns the ordered rule list ``[(a, b), ...]``; stops early when the
    best remaining pair occurs fewer than 2 times.
    """
    vocab = word_freq_table(df, text_col).withColumn(
        "toks", F.split(F.col("word"), "")
    )
    vocab = checkpoint_audited(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.filter(F.size("toks") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - 1),
                        lambda i: F.struct(
                            F.element_at("toks", i).alias("a"),
                            F.element_at("toks", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).first()
        if best is None or best["n"] < 2:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("toks", _merge_adjacent(F.col("toks"), a, b))
        vocab = checkpoint_audited(vocab)
    return merges


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the learned merge rules to every document (map-only) and
    report per-doc BPE token counts: the rules compose as a chain of
    per-word folds, so encoding pipelines into the scan with no shuffle
    beyond the input spread."""
    from mandoline_hbase_spark.operators.skew import spread_to_parallelism

    spread = spread_to_parallelism(df, id_col).withColumn(
        "_words", F.split(F.trim(F.col(text_col)), r"\s+")
    )

    def encode_word(w):
        toks = F.split(w, "")
        for a, b in merges:
            toks = _merge_adjacent(toks, a, b)
        return toks

    n_tok = F.aggregate(
        F.filter(F.col("_words"), lambda w: w != ""),
        F.lit(0),
        lambda acc, w: acc + F.size(encode_word(w)),
    )
    return spread.select(
        F.col(id_col), n_tok.cast("bigint").alias("n_bpe_tokens")
    )


def bpe_verified_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc tokenizer-contract verification, computed in-plan:

    - ``roundtrip_ok``: every word's token sequence concatenates back to
      the word (BPE is lossless by construction; a wrong merge fold
      breaks this immediately);
    - ``token_count_bounded``: total tokens in [n_words, n_chars];
    - ``n_chars``: whitespace-stripped character count (the exact
      SQL-computable anchor column).

    Same map-only shape as :func:`bpe_token_counts`.
    """
    from mandoline_hbase_spark.operators.skew import spread_to_parallelism

    spread = spread_to_parallelism(df, id_col).withColumn(
        "_words", F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    )

    def encode_word(w):
        toks = F.split(w, "")
        for a, b in merges:
            toks = _merge_adjacent(toks, a, b)
        return toks

    words = F.col("_words")
    n_tok = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.size(encode_word(w)))
    n_chars = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    roundtrip = F.forall(words, lambda w: F.concat_ws("", encode_word(w)) == w)
    return spread.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        F.coalesce(roundtrip, F.lit(True)).alias("roundtrip_ok"),
        ((n_tok >= F.size(words)) & (n_tok <= n_chars)).alias("token_count_bounded"),
    )
