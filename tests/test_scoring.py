"""Model-based scoring operators (operators/scoring.py)."""

from __future__ import annotations

import math

from mandoline_hbase_spark.operators import scoring


def test_hashed_linear_score_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "zzz qqq")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in scoring.hashed_linear_score(df).collect()}
    # identical text -> identical logit (pure function of content)
    assert rows[1].logit == rows[2].logit
    assert rows[1].keep == (rows[1].logit > 0)
    # mean of weights in [-1, 1) stays in [-1, 1)
    for r in rows.values():
        assert -1.0 <= r.logit < 1.0
    assert rows[1].n_tokens == 4


def test_hashed_linear_score_empty_doc(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id bigint, text string")
    rows = {r.doc_id: r for r in scoring.hashed_linear_score(df).collect()}
    for r in rows.values():
        assert r.n_tokens == 0 and r.logit == 0.0 and r.keep is False


def test_unigram_stats_hapax_and_probs(spark):
    # corpus: "a" x3, "b" x2, "c" x1 -> total 6
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in scoring.unigram_stats(df).collect()}
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 3
    # doc 2 contains the hapax 'c' (tf=1): rare_ratio = 1/3
    assert math.isclose(rows[2].rare_ratio, round(1 / 3, 4))
    assert rows[1].rare_ratio == 0.0
    # doc 2 min prob = tf(c)/6 = 1/6
    assert math.isclose(rows[2].min_tok_prob, round(1 / 6, 9))
    # doc 1 mean prob = (3/6 + 3/6 + 2/6)/3
    assert math.isclose(rows[1].mean_tok_prob, round((0.5 + 0.5 + 2 / 6) / 3, 9))


def test_source_temperature_weights_sum_to_one_and_flatten(spark):
    df = spark.createDataFrame(
        [(i, "tok " * 9 + "tok", "big") for i in range(9)]
        + [(100, "tok " * 9 + "tok", "small")],
        "doc_id bigint, text string, source string",
    )
    rows = {r.source: r for r in scoring.source_temperature_weights(df).collect()}
    assert math.isclose(sum(r.mix_weight for r in rows.values()), 1.0, abs_tol=1e-5)
    assert math.isclose(sum(r.token_share for r in rows.values()), 1.0, abs_tol=1e-5)
    # temperature flattens: the small source's weight exceeds its share
    assert rows["small"].mix_weight > rows["small"].token_share
    assert rows["big"].mix_weight < rows["big"].token_share
    # T=0.5 exactly: weight ratio = sqrt(share ratio) = sqrt(9) = 3
    assert math.isclose(
        rows["big"].mix_weight / rows["small"].mix_weight, 3.0, rel_tol=1e-4
    )


def test_approx_score_bins_matches_ntile_closely(spark):
    from pyspark.sql import Window, functions as F

    from mandoline_hbase_spark.operators import scoring
    from mandoline_hbase_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.length("text").cast("double").alias("score")
    )
    n = docs.count()
    out = scoring.approx_score_bins(docs, "score", n_bins=10)
    sizes = {r.bin: r.c for r in out.groupBy("bin").agg(F.count("*").alias("c")).collect()}
    assert set(sizes) <= set(range(1, 11))
    # every bin within 60% of the ideal decile size (ties + sketch error)
    ideal = n / 10
    assert all(abs(c - ideal) <= 0.6 * ideal for c in sizes.values()), sizes
    # monotone: higher bin -> higher min score
    mins = {r.bin: r.m for r in out.groupBy("bin").agg(F.min("score").alias("m")).collect()}
    ordered = [mins[b] for b in sorted(mins)]
    assert ordered == sorted(ordered)


def test_approx_score_bins_deterministic(spark):
    from mandoline_hbase_spark.operators import scoring
    from pyspark.sql import functions as F
    from mandoline_hbase_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.length("text").cast("double").alias("score")
    )
    a = sorted((r.doc_id, r.bin) for r in scoring.approx_score_bins(docs, "score").collect())
    b = sorted((r.doc_id, r.bin) for r in scoring.approx_score_bins(docs, "score").collect())
    assert a == b
