"""retrieval_eval_report (operators/ranking.py): graded-relevance IR
metrics with integer discount tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, rank int, neighbor_id bigint"
    )


def test_perfect_run_scores_one(spark):
    from mandoline_hbase_spark.operators.ranking import retrieval_eval_report

    truth = _mk(spark, [(1, r, 100 + r) for r in range(1, 6)])
    out = retrieval_eval_report(truth, truth, k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.hits, r.mrr_units, r.ndcg) == (5, 1_000_000, 1.0)


def test_total_miss_scores_zero(spark):
    from mandoline_hbase_spark.operators.ranking import retrieval_eval_report

    truth = _mk(spark, [(1, r, 100 + r) for r in range(1, 6)])
    run = _mk(spark, [(1, r, 900 + r) for r in range(1, 6)])
    r = retrieval_eval_report(run, truth, k=5).collect()[0]
    assert (r.hits, r.mrr_units, r.dcg_units, r.ndcg) == (0, 0, 0, 0.0)


def test_hand_computed_partial_overlap(spark):
    """Run finds truth-2 at rank 1 and truth-1 at rank 3: rel grades
    4 and 5, gains 15 and 31, discounts d1 and d3."""
    from mandoline_hbase_spark.operators.ranking import (
        NDCG_DISC_UNITS,
        MRR_UNITS,
        ndcg_ideal_units,
        retrieval_eval_report,
    )

    truth = _mk(spark, [(1, r, 100 + r) for r in range(1, 6)])
    run = _mk(
        spark,
        [(1, 1, 102), (1, 2, 999), (1, 3, 101), (1, 4, 998), (1, 5, 997)],
    )
    r = retrieval_eval_report(run, truth, k=5).collect()[0]
    want_dcg = 15 * NDCG_DISC_UNITS[0] + 31 * NDCG_DISC_UNITS[2]
    assert r.hits == 2
    assert r.mrr_units == MRR_UNITS[0]
    assert r.dcg_units == want_dcg
    assert r.ndcg == round(want_dcg / ndcg_ideal_units(5), 6)


def test_sq_run_eval_on_fixture(spark):
    """The catalog config end-to-end: SQ8 shortlist-32 run vs exact
    truth on the smoke fixture — high but honest scores, one row per
    query, ndcg in (0, 1]."""
    from mandoline_hbase_spark.operators.ranking import retrieval_eval_report
    from mandoline_hbase_spark.operators.similarity import cosine_topk, sq_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = cosine_topk(emb, queries, k=5)
    run = sq_topk(emb, queries, k=5, shortlist=32)
    rows = retrieval_eval_report(run, truth, k=5).collect()
    assert len(rows) == 10
    assert all(0.0 < r.ndcg <= 1.0 for r in rows)
    assert sum(r.hits for r in rows) / (5 * len(rows)) >= 0.9


def test_ivf_recall_report_full_probe_is_exact(spark):
    from mandoline_hbase_spark.operators import similarity
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rep = {
        r.n_probe: r
        for r in similarity.ivf_probe_recall_report(
            emb, n_centroids=8, n_queries=10, k=5, probe_levels=(1, 2, 4, 8)
        ).collect()
    }
    # probing every cell IS brute force: the anchor row pins 1.0
    assert rep[8].recall_at_5 == 1.0
    assert all(r.n_queries == 10 for r in rep.values())
    # recall is monotone non-decreasing in the probe budget
    vals = [rep[p].recall_at_5 for p in (1, 2, 4, 8)]
    assert vals == sorted(vals)
    assert 0.0 < vals[0] <= 1.0
