"""Observation-API funnel metrics: one action, per-stage counters, no
extra scans; counters agree with independently recomputed stage counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mandoline_hbase_spark.observability import observed_curation
from mandoline_hbase_spark.operators import dedup, text
from mandoline_hbase_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_observed_curation_metrics_match_recomputation(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    result, obs = observed_curation(docs)
    n_selected = result.count()  # the ONE action; metrics ride along

    m_in = obs["input"].get
    m_dedup = obs["deduped"].get
    m_gate = obs["quality_gated"].get

    assert m_in["n"] == docs.count()
    assert m_dedup["n"] == dedup.dedup_exact_keep_first(docs).count()
    gated = text.with_quality_scores(dedup.dedup_exact_keep_first(docs)).filter(
        F.col("quality_score") >= 0.55
    )
    assert m_gate["n"] == gated.count()
    # funnel monotonicity and the final stage's selection
    assert m_in["n"] >= m_dedup["n"] >= m_gate["n"] >= n_selected > 0
    # token totals are per-stage sums of the same expression
    exp_tok = docs.select(
        F.sum(text.n_tokens(F.col("text"))).cast("bigint").alias("t")
    ).first()["t"]
    assert m_in["tok"] == exp_tok


def test_observed_curation_result_matches_catalog_query(spark):
    from mandoline_hbase_spark.queries.catalog import QUERIES

    docs = load_table(spark, SF_SMOKE, "documents")
    result, _ = observed_curation(docs)
    expected = QUERIES["curate_corpus"].fn(spark, SF_SMOKE)
    got = sorted(map(tuple, result.collect()))
    exp = sorted(map(tuple, expected.collect()))
    assert got == exp


def test_sql_api_parity_on_registered_views(spark):
    """The SQL front door: register_views + spark.sql answers the same
    questions as the DataFrame catalog (Catalyst plans both identically)."""
    from mandoline_hbase_spark.queries.catalog import QUERIES
    from mandoline_hbase_spark.sources.tables import register_views

    register_views(spark, SF_SMOKE)
    sql_q1 = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
                   AS sum_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= timestamp'1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    df_q1 = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in QUERIES["q1_pricing_summary"].fn(spark, SF_SMOKE).collect()
    }
    assert len(sql_q1) == len(df_q1)
    for r in sql_q1:
        d = df_q1[(r["l_returnflag"], r["l_linestatus"])]
        assert r["sum_qty"] == d["sum_qty"]
        assert r["count_order"] == d["count_order"]
