"""MMR diversity re-ranking (similarity.mmr_topk).

Pins: the diversity property (a planted near-duplicate of the top hit
is demoted), the lam=1 degenerate (pure relevance == cosine top-k
order), the pos-1 == top-1 invariant, the 1-candidate solo path, and
determinism of the integer greedy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _by_pos(df):
    out: dict[int, list] = {}
    for r in df.collect():
        out.setdefault(r.query_id, []).append((r.pos, r.neighbor_id, r.mmr_units))
    return {q: [x[1:] for x in sorted(v)] for q, v in out.items()}


def test_mmr_demotes_planted_near_duplicate(spark):
    """Candidates: two almost-identical high-relevance vectors + one
    moderately relevant orthogonal one. Plain top-3 ranks the twin
    second; MMR (lam=1/2) picks the orthogonal vector second."""
    from mandoline_hbase_spark.operators.similarity import cosine_topk, mmr_topk

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),        # query
            (1, [0.99, 0.14, 0.0]),      # best hit
            (2, [0.99, 0.141, 0.0]),     # near-duplicate of 1
            (3, [0.5, 0.0, 0.87]),       # diverse, moderately relevant
        ],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0)
    plain = [r.neighbor_id for r in cosine_topk(emb, q, k=3).orderBy("rank").collect()]
    assert plain == [1, 2, 3]
    mmr = _by_pos(mmr_topk(emb, q, k_candidates=3, k=3))[0]
    assert [x[0] for x in mmr] == [1, 3, 2]


def test_mmr_lambda_one_is_pure_relevance(spark):
    """lam_num == lam_den kills the diversity term: picks must equal the
    cosine top-k in rank order."""
    from mandoline_hbase_spark.operators.similarity import cosine_topk, mmr_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    exact = {q: [x[1] for x in sorted(v)] for q, v in exact.items()}
    mmr = _by_pos(mmr_topk(emb, queries, k_candidates=20, k=5, lam_num=1, lam_den=1))
    assert {q: [x[0] for x in v] for q, v in mmr.items()} == exact


def test_mmr_first_pick_is_top1_and_deterministic(spark):
    from mandoline_hbase_spark.operators.similarity import cosine_topk, mmr_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    top1 = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(emb, queries, k=1).collect()
    }
    a = _by_pos(mmr_topk(emb, queries, k_candidates=20, k=5))
    b = _by_pos(mmr_topk(emb, queries, k_candidates=20, k=5))
    assert a == b
    assert {q: v[0][0] for q, v in a.items()} == top1
    assert all(len(v) == 5 for v in a.values())


def test_mmr_single_candidate_solo_path(spark):
    """A 2-row corpus leaves exactly one candidate per query: the no-pair
    solo branch must emit the pos-1 row with mmr_units = lam_num*rel_u."""
    from mandoline_hbase_spark.operators.similarity import mmr_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.8, 0.6])],
        "vec_id bigint, embedding array<double>",
    )
    out = mmr_topk(emb, emb.filter(F.col("vec_id") == 0), k_candidates=5, k=3)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.query_id, r.pos, r.neighbor_id) == (0, 1, 1)
    assert r.mmr_units == 800000  # floor(cos * 1e6) = floor(0.8e6)
