"""Model-based document scoring: the filtering stage of an LLM data
pipeline expressed as pure JVM column algebra.

Production pipelines gate documents with (a) a lightweight linear
quality classifier (fastText-style: hashed bag-of-words features times a
weight vector), (b) language-model statistics (rare/unknown-token rates
against corpus unigram frequencies — the cheap stand-in for perplexity
filtering), and (c) source reweighting with a temperature exponent
before mixing. All three are implemented here without Python UDFs:

- the classifier is ``aggregate(tokens, 0.0, acc + w[h(token)])`` — one
  scan-speed fold per document; the weight table is a pure function of
  the hash bucket, so nothing is broadcast and the op is map-only;
- unigram statistics are one token-keyed aggregation plus one join of
  exploded tokens against the frequency table (both shuffles keyed on
  the token — the minimum for corpus-global statistics);
- temperature weights aggregate per source (one tiny shuffle) and
  normalize with ``sqrt`` — IEEE-correctly-rounded on every engine, so
  the numbers are reproducible bit-for-bit across engines (a general
  ``pow(x, alpha)`` is not, which is why the temperature is fixed at
  0.5 rather than configurable).

Hash discipline: the feature hash is the first 8 hex chars of md5
(available and identical in Spark, DuckDB, and every warehouse), NOT
xxhash64 — these scores are part of the oracle-checked surface.

The reference has no scoring surface (SURVEY.md §2.2); this extends the
LLM-pipeline family (dedup/text/similarity/sampling/packing) with the
model-based filtering stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative-hash constant: spreads bucket ids into
# pseudo-random weights deterministically on any engine with 64-bit
# integer arithmetic.
_WEIGHT_MIX = 2654435761


def _bucket(token, n_buckets: int):
    """md5-based feature bucket in [0, n_buckets) — engine-portable."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("bigint") % n_buckets


def _weight(bucket):
    """Deterministic pseudo-weight in [-1, 1): ((b * K) % 2000)/1000 - 1."""
    return ((bucket * F.lit(_WEIGHT_MIX)) % 2000).cast("double") / 1000.0 - 1.0


def hashed_linear_score(
    df: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Linear classifier logit over hashed bag-of-words features.

    ``logit = mean over tokens of w[h(token)]`` with ``h`` an md5 bucket
    and ``w`` a deterministic pseudo-weight table (stands in for trained
    weights; swap ``_weight`` for an ``element_at(lit(weights), bucket)``
    lookup to serve a real model). One map-only fold per document — at
    100 TB this runs at scan speed with zero shuffle, the shape any
    fastText-class quality gate compiles to. ``keep = logit > 0`` is the
    admission decision.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + _weight(_bucket(t, n_buckets)),
    )
    empty = F.length(F.trim(F.col(text_col))) == 0
    logit = F.when(empty, F.lit(0.0)).otherwise(total / n)
    return df.select(
        F.col(id_col),
        F.when(empty, F.lit(0)).otherwise(n).cast("bigint").alias("n_tokens"),
        F.round(logit, 6).alias("logit"),
        (logit > 0).alias("keep"),
    )


def unigram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram-frequency statistics against the corpus.

    Two aggregations, both keyed on the token — the minimum shuffle
    structure for corpus-global statistics: (1) build the unigram
    frequency table, (2) join each document's exploded tokens back and
    aggregate per document. Returns mean token probability, rare-token
    ratio (corpus frequency 1 — hapax legomena), and the document's
    minimum token probability: the cheap engine-side stand-ins for
    perplexity filtering (low mean prob / high rarity = OOD text).

    At scale the frequency table is the reusable artifact (materialize
    once per corpus snapshot); scoring a new batch is one broadcast-or-
    shuffle join against it.
    """
    toks = df.select(
        F.col(id_col),
        F.explode_outer(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = freq.agg(F.sum("tf").cast("double").alias("_total"))
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(F.col("tf") / F.col("_total")), 9).alias("mean_tok_prob"),
            F.round(
                F.sum(F.when(F.col("tf") == 1, 1).otherwise(0)) / F.count(F.lit(1)), 4
            ).alias("rare_ratio"),
            F.round(F.min(F.col("tf") / F.col("_total")), 9).alias("min_tok_prob"),
        )
    )
    return scored


def source_temperature_weights(df: DataFrame, source_col: str = "source", text_col: str = "text") -> DataFrame:
    """Temperature-reweighted source mixture (T = 0.5).

    Computes each source's token share and the renormalized sampling
    weight ``sqrt(share) / sum(sqrt(share))`` — the standard temperature
    trick that up-weights small high-quality sources when composing a
    training mix. ``sqrt`` (not a general ``pow``) because IEEE 754
    requires it correctly rounded, making the weights bit-reproducible
    across engines. One tiny aggregation per source; the weights then
    drive ``sampling.weighted_sample_n`` / ``mix_sources_token_budget``.
    """
    from mandoline_hbase_spark.operators.text import n_tokens

    per_source = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n_tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    tot = per_source.agg(F.sum("n_tokens").cast("double").alias("_tot"))
    shared = per_source.crossJoin(F.broadcast(tot)).withColumn(
        "_sq", F.sqrt(F.col("n_tokens") / F.col("_tot"))
    )
    denom = shared.agg(F.sum("_sq").alias("_denom"))
    return (
        shared.crossJoin(F.broadcast(denom))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_tot"), 6).alias("token_share"),
            F.round(F.col("_sq") / F.col("_denom"), 6).alias("mix_weight"),
        )
    )


def approx_score_bins(
    df: DataFrame,
    score_col: str,
    n_bins: int = 10,
    accuracy: int = 10_000,
    out_col: str = "bin",
) -> DataFrame:
    """Quantile binning at scale: ONE mergeable-sketch pass
    (``percentile_approx``, Greenwald-Khanna) computes the ``n_bins - 1``
    cutoffs, then binning is a map-only comparison against the broadcast
    cutoff literals.

    This is the 100 TB twin of the exact ``ntile`` decile query
    (relational_ext.quality_decile_bins): ntile is a GLOBAL sort window —
    all rows through one partition — while this is sketch-merge +
    scan-speed CASE, at the cost of boundary error bounded by the sketch
    accuracy. Rows equal to a cutoff land in the lower bin (ties below),
    matching ``value > cutoff`` bin advancement.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    pcts = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        F.percentile_approx(score_col, pcts, accuracy).alias("c")
    ).first()["c"]
    cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
    binned = (
        F.size(F.filter(cut_arr, lambda c: F.col(score_col) > c)) + 1
    ).cast("bigint")
    return df.withColumn(out_col, binned)


def dsir_log_weights(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    documents are scored by how much more likely their hashed-bigram
    profile is under a TARGET distribution (rows where ``target_pred``
    is true — a trusted domain sample) than under the raw corpus.

        log w(doc) = Σ_grams  ln p_target(bucket) − ln p_raw(bucket)

    with add-one smoothing over the fixed bucket space. Feed the weights
    to ``sampling.weighted_sample_*`` (A-ES) to resample the corpus
    toward the target domain — importance resampling without training a
    model.

    Plan shape: one map-only bigram explode; ONE bucket-keyed aggregate
    builds both distributions (conditional aggregation — the target is a
    slice of the same scan, not a second pass); the log-ratio table is
    at most ``n_buckets`` rows joined back on the bucket key; one final
    per-document aggregate. Hash discipline: md5-prefix buckets, so the
    whole computation is oracle-checkable and engine-portable.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ex = (
        df.withColumn("_is_t", target_pred)
        .filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.col("_is_t"), F.explode(grams).alias("gram"))
        .withColumn("bucket", F.substring(F.md5(F.col("gram")), 1, 4))
    )
    bcount = ex.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = bcount.agg(
        F.sum("c_raw").cast("double").alias("t_raw"),
        F.sum("c_tgt").cast("double").alias("t_tgt"),
    )
    ratio = bcount.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_tgt") + 1.0) / (F.col("t_tgt") + float(n_buckets)))
            - F.log((F.col("c_raw") + 1.0) / (F.col("t_raw") + float(n_buckets)))
        ).alias("logratio"),
    )
    return (
        ex.join(ratio, "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.round(F.sum("logratio"), 6).alias("log_weight"),
        )
    )


def bigram_lm_perplexity(
    df: DataFrame,
    train_pred=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram language-model scoring (CCNet-style perplexity
    filtering, Wenzek et al. 2020): train a bigram LM on the corpus (or
    the ``train_pred`` slice — score against a clean reference the way
    CCNet scores against Wikipedia) and score every document by its
    per-token negative log-likelihood

        P(w_i | w_{i-1}) = λ · c(w_{i-1} w_i)/c(w_{i-1})
                         + (1−λ) · (c(w_i)+1)/(T+V)

    (fixed λ = 0.75 — exactly representable in binary, so 1−λ is too
    and every engine computes identical constants — with add-one unigram
    backoff, so unseen
    bigrams and unseen words are both finite). High ``avg_nll`` = text
    the reference model finds surprising — the classic gibberish /
    boilerplate / wrong-language gate.

    Plan shape: token and bigram count tables are each one keyed
    aggregate over the same exploded scan; scoring joins each document's
    bigram rows against the two count tables on their natural keys and
    folds per document. The count tables are the reusable artifact at
    scale (materialize per corpus snapshot; scoring a new batch is two
    joins). All arithmetic is engine-portable column algebra — the op is
    oracle-checked, no Python in the hot path.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.withColumn(
        "_is_train",
        train_pred if train_pred is not None else F.lit(True),
    ).filter(F.size(toks) >= 2)
    pairs = base.select(
        F.col(id_col),
        F.col("_is_train"),
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
            )
        ).alias("p"),
    ).select(id_col, "_is_train", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))

    big = pairs.filter("_is_train").groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("c_big")
    )
    uni = pairs.filter("_is_train").groupBy(F.col("cur").alias("w")).agg(
        F.count(F.lit(1)).alias("c_uni")
    )
    totals = uni.agg(
        F.sum("c_uni").cast("double").alias("t_uni"),
        F.count(F.lit(1)).cast("double").alias("v_uni"),
    )
    prev_tot = big.groupBy("prev").agg(F.sum("c_big").alias("c_prev"))

    scored = (
        pairs.join(big, ["prev", "cur"], "left")
        .join(prev_tot, "prev", "left")
        .join(uni.withColumnRenamed("w", "cur"), "cur", "left")
        .crossJoin(F.broadcast(totals))
    )
    p_big = F.when(
        F.col("c_prev").isNotNull() & F.col("c_big").isNotNull(),
        F.col("c_big") / F.col("c_prev"),
    ).otherwise(F.lit(0.0))
    p_uni = (F.coalesce(F.col("c_uni"), F.lit(0)) + 1.0) / (F.col("t_uni") + F.col("v_uni"))
    nll = -F.log(lam * p_big + (1.0 - lam) * p_uni)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg(nll), 6).alias("avg_nll"),
    )
