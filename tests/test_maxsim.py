"""MaxSim (ColBERT-style late interaction, similarity.maxsim_topk).

Pins: hand-computed score on a tiny multi-vector corpus, the
n_tokens=1 degenerate case (MaxSim over one token IS plain cosine),
asymmetry (best doc token per query token, not vice versa), and
determinism of the fixed-order score expression.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_maxsim_hand_computed(spark):
    """2 tokens x 2 dims: every cosine is 0/1/-1 by construction, so the
    MaxSim sums are exact small integers."""
    from mandoline_hbase_spark.operators.similarity import maxsim_topk

    # token layout: [t1x, t1y, t2x, t2y]
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 1.0]),  # query: tokens +x, +y
            (1, [1.0, 0.0, 0.0, 1.0]),  # identical twin -> 1 + 1
            (2, [0.0, 1.0, 1.0, 0.0]),  # swapped tokens -> still 1 + 1 (MaxSim
            #                              matches each query token to its BEST
            #                              doc token, order-free)
            (3, [-1.0, 0.0, 0.0, -1.0]),  # antipodal: each query token's
            #                               BEST doc token is the orthogonal
            #                               one (cos 0 > cos -1) -> 0 + 0
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = maxsim_topk(emb, emb.filter(F.col("vec_id") == 0), n_tokens=2, k=3, dim=4)
    got = {r.neighbor_id: (r.rank, r.maxsim) for r in out.collect()}
    assert got[1] == (1, 2.0)
    assert got[2] == (2, 2.0) or got[2] == (1, 2.0)  # tie with 1 broken by id
    assert got[1][0] == 1 and got[2][0] == 2  # neighbor_id ASC tie-break
    assert math.isclose(got[3][1], 0.0)


def test_maxsim_single_token_is_cosine(spark):
    """n_tokens=1 degenerates to exact cosine top-k (same tie-break,
    same rounding) — the score column name aside."""
    from mandoline_hbase_spark.operators.similarity import cosine_topk, maxsim_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = _rows(cosine_topk(emb, queries, k=5))
    ms = _rows(
        maxsim_topk(emb, queries, n_tokens=1, k=5, dim=64).withColumnRenamed(
            "maxsim", "sim"
        )
    )
    assert exact == ms


def test_maxsim_asymmetric_containment(spark):
    """A doc containing ALL the query's tokens scores the full n_tokens
    even when it also contains unrelated tokens — the late-interaction
    property single-vector cosine lacks."""
    from mandoline_hbase_spark.operators.similarity import maxsim_topk

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 1.0, 0.0]),  # query repeats token +x
            (1, [1.0, 0.0, 0.0, 1.0]),  # has +x (and an unrelated +y)
            (2, [0.0, 1.0, 0.0, 1.0]),  # no +x at all
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = maxsim_topk(emb, emb.filter(F.col("vec_id") == 0), n_tokens=2, k=2, dim=4)
    got = {r.neighbor_id: r.maxsim for r in out.collect()}
    assert got[1] == 2.0  # both query tokens find +x
    assert got[2] == 0.0  # orthogonal everywhere


def test_maxsim_deterministic(spark):
    from mandoline_hbase_spark.operators.similarity import maxsim_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = _rows(maxsim_topk(emb, queries, n_tokens=4, k=5))
    b = _rows(maxsim_topk(emb, queries, n_tokens=4, k=5))
    assert a == b and len(a) == 5 * 5


def test_maxsim_rerank_full_shortlist_equals_flat(spark):
    """A corpus-wide shortlist admits everything, so the two-stage form
    must equal flat maxsim_topk exactly (shared score expression)."""
    from mandoline_hbase_spark.operators.similarity import (
        maxsim_rerank_topk,
        maxsim_topk,
    )
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    flat = _rows(maxsim_topk(emb, queries, n_tokens=4, k=5))
    two = _rows(
        maxsim_rerank_topk(
            emb, queries, n_tokens=4, k_shortlist=1_000_000, k=5
        ).drop("pooled_sim")
    )
    assert flat == two


def test_maxsim_rerank_shows_lift(spark):
    """A doc whose tokens are scrambled relative to the query outranks a
    half-matching doc under MaxSim even though pooled cosine prefers
    the latter — the observable late-interaction lift."""
    from mandoline_hbase_spark.operators.similarity import maxsim_rerank_topk

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 1.0]),   # query tokens +x, +y
            (1, [0.0, 1.0, 1.0, 0.0]),   # scrambled twin: pooled cos 0, maxsim 2
            (2, [1.0, 0.0, 1.0, 0.0]),   # half match: pooled cos 0.5, maxsim 1
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = maxsim_rerank_topk(
        emb, emb.filter(F.col("vec_id") == 0), n_tokens=2, k_shortlist=5, k=2, dim=4
    ).collect()
    got = {r.neighbor_id: (r.rank, r.maxsim, r.pooled_sim) for r in out}
    assert got[1][0] == 1 and got[1][1] == 2.0 and got[1][2] == 0.0
    assert got[2][0] == 2 and got[2][1] == 1.0
