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
    # The loop needs only (freq, toks): dropping ``word`` narrows every
    # per-round scan and checkpoint, and single-token words can never
    # produce a pair or be rewritten again, so they leave the working
    # set for good — both filters leave the pair counts (hence the
    # learned rules) untouched. Checkpoints are LAZY: the very next
    # pair-count action materializes them, one job per round instead of
    # a dedicated materialization job on top.
    vocab = (
        word_freq_table(df, text_col)
        .select("freq", F.split(F.col("word"), "").alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    vocab = checkpoint_audited(vocab, eager=False)
    merges: list[tuple[str, str]] = []
    for round_no in range(n_merges):
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
        # checkpoint on a CADENCE, not per round (the iterative-operator
        # rule from round 3): the vocab table is Heaps-bounded, so
        # re-evaluating up to two stacked merge folds inside the next
        # pair count is cheaper than a materialization job every round.
        # Every 3rd round truncates lineage before Catalyst analysis
        # depth starts to dominate, shedding fully-merged words as it
        # goes.
        if round_no % 3 == 2:
            vocab = checkpoint_audited(
                vocab.filter(F.size("toks") >= 2), eager=False
            )
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
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Per-doc tokenizer-contract verification, computed in-plan:

    - ``roundtrip_ok``: every word's token sequence concatenates back to
      the word (BPE is lossless by construction; a wrong merge fold
      breaks this immediately);
    - ``token_count_bounded``: total tokens in [n_words, n_chars];
    - ``n_chars``: whitespace-stripped character count (the exact
      SQL-computable anchor column).

    Encoding runs at VOCABULARY grain (r10): the merge-fold chain
    depends only on the word, so it is evaluated once per DISTINCT word
    and broadcast-joined back to the exploded occurrences — the same
    Heaps-law bound the trainer exploits, applied to the encoder. The
    per-occurrence work drops from |merges| chained folds to a hash
    probe; the per-doc reduction partial-aggregates map-side (explode
    keeps a doc's occurrences within one partition), so the doc-grain
    exchange carries one row per document, exactly like the old
    map-only form. Output is value-identical, including the edge
    behavior: empty/whitespace-only text -> (0, true, true) and NULL
    text -> (null, true, null), both pinned by the explode_outer null
    row + the pre-explode ``_words IS NULL`` flag.
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

    occ = spread.select(
        F.col(id_col),
        F.col("_words").isNull().alias("_null_words"),
        F.explode_outer("_words").alias("_w"),
    )
    enc = encode_word(F.col("word"))
    vtab = (
        occ.filter(F.col("_w").isNotNull())
        .select(F.col("_w").alias("word"))
        .distinct()
        .select(
            "word",
            F.size(enc).alias("_nt"),
            (F.concat_ws("", enc) == F.col("word")).alias("_rt"),
            F.length("word").alias("_nc"),
        )
    )
    # ``broadcast_vocab`` (ADVICE r10): the vocab is Heaps-bounded but
    # still grows with the corpus (~70M distinct words at 100 TB — past
    # the 8 GB broadcast cap), and a forced hint bypasses Spark's size
    # check. Default lets AQE pick from the vocab's ACTUAL size
    # (degrades to a shuffle join, never to a broadcast OOM); callers
    # that know their corpus opt in for the guaranteed shuffle-free plan.
    joined_vtab = F.broadcast(vtab) if broadcast_vocab else vtab
    per_doc = (
        occ.join(joined_vtab, occ["_w"] == vtab["word"], "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("_nt"), F.lit(0))).alias("_ntok"),
            F.sum(F.coalesce(F.col("_nc"), F.lit(0))).alias("_nchars"),
            F.count(F.col("_w")).alias("_nwords"),
            F.min(F.coalesce(F.col("_rt"), F.lit(True))).alias("_roundtrip"),
            F.max(F.col("_null_words")).alias("_nullw"),
        )
    )
    null_if_null_text = lambda c: F.when(F.col("_nullw"), F.lit(None)).otherwise(c)  # noqa: E731
    return per_doc.select(
        F.col(id_col),
        null_if_null_text(F.col("_nchars")).cast("bigint").alias("n_chars"),
        F.col("_roundtrip").alias("roundtrip_ok"),
        null_if_null_text(
            (F.col("_ntok") >= F.col("_nwords")) & (F.col("_ntok") <= F.col("_nchars"))
        ).alias("token_count_bounded"),
    )
