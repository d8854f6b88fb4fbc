"""Pattern-mining and record-linkage operators.

Batch analytics a curation pipeline runs over the raw tables before
(or instead of) training-set assembly:

- :func:`association_rules` — market-basket rules with a-priori
  pruning (pair frequent => both items frequent, so the frequent-item
  broadcast semi-join is lossless);
- :func:`chi2_terms` — chi-square term/label association, the classic
  feature-selection score for quality/domain classifiers;
- :func:`kneser_ney_bigrams` — interpolated Kneser-Ney bigram
  probabilities (the absolute-discount LM smoothing used for corpus
  fluency scoring);
- :func:`blocked_er_matches` — blocked entity resolution: candidate
  pairs only within a block key that is PART of the match predicate,
  so blocking is provably complete (no match can span two blocks);
- :func:`er_entity_clusters` — golden-record entity ids via connected
  components over the match graph (the dedup CC operator reused);
- :func:`ewma_per_key` — recursive exponentially-weighted moving
  average as an ordered fold, bit-identical to any engine that folds
  the same sequence in the same order.

Reference parity note: the reference backend (hbase.clj) has no mining
surface; these are north-star LLM-pipeline extensions (SURVEY.md §2.2).

100 TB shapes, per operator, in the docstrings below — none of them is
all-pairs: rules are basket-grain self-joins after a broadcast prune,
chi2/KN are vocabulary-grain shuffles, ER candidates are block-grain,
EWMA is key-grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Market-basket association rules (a-priori pruned)
# --------------------------------------------------------------------------
def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_item_count: int = 20,
    min_pair_count: int = 3,
) -> DataFrame:
    """Association rules ``antecedent -> consequent`` over item pairs.

    A-priori pruning: a pair reaching ``min_pair_count`` implies both
    items reach it, so filtering basket items to those with count >=
    ``min_item_count`` (<= min_pair_count) before the pair join loses
    nothing as long as ``min_item_count <= min_pair_count``; with a
    larger ``min_item_count`` the guarantee is the standard a-priori
    one for thresholds expressed on items. Here both thresholds are
    caller-set and the pair filter is applied after counting, so the
    output is exactly "pairs with count >= min_pair_count among items
    with count >= min_item_count" — the oracle states the same.

    100 TB shape: item counts are one item-grain shuffle; the frequent
    set (bounded by n_rows / min_item_count) broadcasts; the pair
    generation is a self-join co-partitioned on the basket key, with
    per-basket work quadratic only in the (small, bounded) basket size;
    pair counts are one pair-grain shuffle. The 1-row basket total is a
    broadcast-scalar crossJoin (the tfidf doc-count shape).
    """
    items = df.select(basket_col, item_col).distinct()
    totals = items.agg(
        F.count_distinct(F.col(basket_col)).alias("n_baskets")
    )
    item_cnt = items.groupBy(item_col).agg(F.count(F.lit(1)).alias("item_count"))
    freq = item_cnt.filter(F.col("item_count") >= min_item_count)
    fi = items.join(F.broadcast(freq.select(item_col)), item_col, "inner")

    a = fi.select(F.col(basket_col).alias("b"), F.col(item_col).alias("item_a"))
    b = fi.select(F.col(basket_col).alias("b"), F.col(item_col).alias("item_b"))
    pairs = a.join(b, "b").filter(F.col("item_a") < F.col("item_b"))
    pair_cnt = (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )

    # both rule directions from each unordered pair
    fwd = pair_cnt.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    )
    rev = pair_cnt.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        "pair_count",
    )
    rules = fwd.unionByName(rev)

    ante = freq.select(
        F.col(item_col).alias("antecedent"), F.col("item_count").alias("cnt_a")
    )
    cons = freq.select(
        F.col(item_col).alias("consequent"), F.col("item_count").alias("cnt_c")
    )
    out = (
        rules.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "antecedent",
        "consequent",
        F.col("pair_count").cast("bigint").alias("pair_count"),
        F.round(F.col("pair_count") / F.col("n_baskets"), 6).alias("support"),
        F.round(F.col("pair_count") / F.col("cnt_a"), 6).alias("confidence"),
        F.round(
            (F.col("pair_count") * F.col("n_baskets"))
            / (F.col("cnt_a") * F.col("cnt_c")),
            4,
        ).alias("lift"),
    ).orderBy("antecedent", "consequent")


# --------------------------------------------------------------------------
# Chi-square term/label association (feature selection)
# --------------------------------------------------------------------------
def chi2_terms(
    docs: DataFrame,
    label_col: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 15,
) -> DataFrame:
    """Top-k terms per label by chi-square doc-frequency association.

    Contingency per (term, label) over document presence: a = docs of
    the label containing the term, b = other docs containing it,
    c = label docs without it, d = the rest;
    chi2 = N (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)). All counts are
    exact integers, so the double division is bit-deterministic across
    engines; ranking breaks ties on the term itself.

    100 TB shape: tokenize + per-doc distinct is map-side; (term, label)
    and term-grain counts are vocabulary-grain shuffles (Heaps' law:
    sublinear in the corpus); label totals broadcast; the corpus total
    is a broadcast 1-row scalar. Final top-k ranks within label over
    the already-aggregated vocabulary table.
    """
    terms = (
        docs.select(
            F.col(id_col),
            F.col(label_col).alias("label"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "term"
            ),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    tl = terms.groupBy("term", "label").agg(F.count(F.lit(1)).alias("a"))
    t = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    lab = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("df_l")
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    j = (
        tl.join(t, "term")
        .join(F.broadcast(lab), "label")
        .crossJoin(F.broadcast(total))
    )
    a = F.col("a")
    b = F.col("df_t") - a
    c = F.col("df_l") - a
    d = F.col("n_docs") - F.col("df_t") - c
    # (ad - bc) stays exact in bigint, then everything moves to double in
    # the SAME association order as the oracle SQL (bit-identical floats)
    diff = (a * d - b * c).cast("double")
    num = F.col("n_docs").cast("double") * diff * diff
    den = (
        F.col("df_t").cast("double")
        * (F.col("n_docs") - F.col("df_t")).cast("double")
        * F.col("df_l").cast("double")
        * (F.col("n_docs") - F.col("df_l")).cast("double")
    )
    # Degenerate margins (a term in EVERY doc, or a label spanning the
    # whole corpus) zero the denominator. Spark's non-ANSI double
    # division returns NULL there while IEEE engines return inf/NaN, so
    # rank order would diverge; chi2 = 0 is also the right statistic
    # (a zero margin carries no discriminative information).
    scored = j.select(
        "label",
        "term",
        a.cast("bigint").alias("df_in_label"),
        (F.col("df_t") - a).cast("bigint").alias("df_elsewhere"),
        F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("chi2_raw"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("chi2_raw").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "label",
            F.col("rank").cast("int").alias("rank"),
            "term",
            "df_in_label",
            "df_elsewhere",
            F.round(F.col("chi2_raw"), 4).alias("chi2"),
        )
        .orderBy("label", "rank")
    )


# --------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM
# --------------------------------------------------------------------------
def kneser_ney_bigrams(
    docs: DataFrame,
    *,
    text_col: str = "text",
    discount: float = 0.75,
    top_k: int = 200,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities for the top bigrams.

    P(w2|w1) = max(c12 - D, 0)/c1 + (D * N1+(w1 .)/c1) * (N1+(. w2)/T)
    with D the absolute discount, c1 = total bigrams starting w1,
    N1+(w1 .) = distinct continuations of w1, N1+(. w2) = distinct
    histories of w2, T = total distinct bigram types (Kneser-Ney's
    continuation unigram). Integer counts only; the float expression is
    written in one fixed shape so both engines evaluate identically.

    100 TB shape: bigram extraction is map-side (array zip of adjacent
    tokens); all aggregations are bigram-/unigram-type-grain shuffles
    (vocabulary-sized, Heaps-sublinear); the type total T is a
    broadcast 1-row scalar; top-k bounds the output.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    docs_w = docs.select(toks.alias("w")).filter(F.size("w") >= 2)
    big = docs_w.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, F.size("w") - 1).alias("w1"),
                F.slice(F.col("w"), 2, F.size("w") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n_cont")
    )
    nb = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n_hist"))
    types = c12.agg(F.count(F.lit(1)).alias("n_types"))

    j = (
        c12.join(c1, "w1")
        .join(nb, "w2")
        .crossJoin(F.broadcast(types))
    )
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("n_cont") / F.col("c1"))
        * (F.col("n_hist") / F.col("n_types"))
    )
    return (
        j.select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.round(p, 6).alias("p_kn"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(top_k)
    )


# --------------------------------------------------------------------------
# Blocked entity resolution with planted twins
# --------------------------------------------------------------------------
def _er_universe(customers: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The ER fixture universe: normalized customers UNION a perturbed
    twin of each (name's 5th char dropped — levenshtein distance exactly
    1; block columns + balance unchanged), with twin ids offset by the
    next power of 10 above the max id so they can never collide with
    real ids. Returns (people, 1-row offset frame)."""
    base = customers.select(
        F.col("c_custkey").cast("bigint").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    # next power of 10 above max id: 10^(digit count), with round()
    # killing any libm pow() off-by-one-ulp before the bigint cast
    off = base.agg(
        F.round(
            F.pow(F.lit(10.0), F.length(F.max("id").cast("string"))), 0
        )
        .cast("bigint")
        .alias("offset")
    )
    twins = base.crossJoin(F.broadcast(off)).select(
        (F.col("id") + F.col("offset")).alias("id"),
        F.concat(
            F.substring("name", 1, 4), F.expr("substring(name, 6)")
        ).alias("name"),
        "nation",
        "segment",
        "bal",
    )
    return base.unionByName(twins), off


def blocked_er_matches(
    customers: DataFrame,
    *,
    max_name_dist: int = 2,
    max_bal_diff: float = 0.5,
) -> DataFrame:
    """Blocked entity resolution over customers with planted twins.

    The match predicate is: SAME (nationkey, mktsegment) block AND
    levenshtein name distance <= ``max_name_dist`` AND account-balance
    gap <= ``max_bal_diff``. Because block-key equality is PART of the
    match definition, blocking on it is provably complete — no true
    match can span two blocks, so "candidates within block, then
    verify" returns exactly the brute-force answer (the oracle runs the
    brute force grouped only by nation — a strict superset of the
    (nation, segment) blocks).

    Recall fixture: a deterministic perturbed twin of every customer is
    unioned in (id offset = the next power of 10 above max id, so twin
    ids can never collide with real ids — the simhash-oracle lesson),
    with one char dropped from the name (distance 1) and block columns
    + balance unchanged. Every twin pair MUST appear in the output:
    recall on planted dups is 100% by construction, and any accidental
    real-real match (TPC-H names differ only in digits, so distance <=2
    name pairs exist) is emitted by both sides identically — the
    balance gate keeps those rare.

    100 TB shape: candidates are a self-join co-partitioned on the
    block key EXTENDED with a balance band — the match predicate
    requires a balance gap <= ``max_bal_diff``, so a pair's
    unit-width floor buckets differ by at most 1 (provably: the bucket
    width exceeds the gap), and probing each row's bucket plus its two
    neighbours covers every match. The band keeps blocks near-constant
    size as the corpus grows ((nation, segment) alone grows linearly,
    which made per-block work quadratic — measured 16 s at sf0.1
    before the band, sub-second after), so the join is corpus-linear.
    The id offset is a broadcast 1-row scalar.
    """
    if max_bal_diff >= 1.0:
        raise ValueError(
            "max_bal_diff must stay under the unit bucket width, or the "
            "+-1 bucket probe is no longer provably complete"
        )
    people, off = _er_universe(customers)

    bucket = F.floor(F.col("bal")).cast("bigint")
    l = people.select(
        "nation",
        "segment",
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bucket"),
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
        F.col("bal").alias("bal_a"),
    )
    r = people.select(
        "nation",
        "segment",
        bucket.alias("bucket"),
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("bal").alias("bal_b"),
    )
    cand = l.join(r, ["nation", "segment", "bucket"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    verified = cand.filter(
        (F.levenshtein("name_a", "name_b") <= max_name_dist)
        & (F.abs(F.col("bal_a") - F.col("bal_b")) <= max_bal_diff)
    )
    return (
        verified.crossJoin(F.broadcast(off))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("name_dist"),
            F.round(F.abs(F.col("bal_a") - F.col("bal_b")), 4).alias(
                "bal_diff"
            ),
            (F.col("id_b") - F.col("id_a") == F.col("offset"))
            .cast("int")
            .alias("is_planted"),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# EWMA as an ordered fold
# --------------------------------------------------------------------------
def ewma_per_key(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """Final EWMA of ``value_col`` per key, ordered by (ts, tiebreak).

    s_1 = x_1; s_i = alpha * x_i + (1 - alpha) * s_{i-1}. Computed as a
    sequential left fold over the key's ordered values — the SAME fold
    any engine runs — so the float result is bit-identical without
    resorting to the exploding (1-a)^-i window rewrite (which loses
    precision past ~750 rows per key in float64).

    100 TB shape: one key-grain shuffle; the per-key ordered list is
    bounded by per-key cardinality (user event history). For unbounded
    keys the streaming twin is transformWithState with the single
    running scalar per key — the fold here is the batch/backfill form,
    and it segments: fold chunk c starting from chunk c-1's result,
    so a too-hot key can be folded in bounded-memory segments.
    """
    a = float(alpha)
    ordered = events.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(ts_col, tiebreak_col, value_col))
        ).alias("seq")
    )
    vals = F.col("seq")[value_col]
    folded = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1).cast("double"),
        lambda s, x: F.lit(a) * x + F.lit(1.0 - a) * s,
    )
    return ordered.select(
        F.col(key_col),
        F.size("seq").cast("bigint").alias("n_events"),
        F.round(folded, 4).alias("ewma_value"),
    ).orderBy(key_col)


def er_entity_clusters(
    customers: DataFrame,
    *,
    max_name_dist: int = 2,
    max_bal_diff: float = 0.5,
) -> DataFrame:
    """Entity ids from the blocked-ER match graph: the golden-record step.

    Matches from :func:`blocked_er_matches` are edges; distributed
    hash-min connected components (the dedup CC operator — one shuffle
    per round, rounds = component diameter) assign every person the
    minimum id of their component as ``entity_id``. Singletons map to
    themselves; ``is_canonical`` marks the surviving golden record.

    100 TB shape: the match graph is block-bounded (see
    blocked_er_matches); CC is the audited iterative operator shared
    with near-dup clustering (checkpoint cadence, edge-grain shuffles).
    """
    from mandoline_hbase_spark.operators import dedup as dedup_ops

    people, _ = _er_universe(customers)
    matches = blocked_er_matches(
        customers, max_name_dist=max_name_dist, max_bal_diff=max_bal_diff
    ).select("id_a", "id_b")
    assigned = dedup_ops.connected_components(
        people.select("id"), matches, id_col="id",
        src_col="id_a", dst_col="id_b",
    )
    return assigned.select(
        "id",
        F.col("cluster_id").cast("bigint").alias("entity_id"),
        (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
    ).orderBy("id")
