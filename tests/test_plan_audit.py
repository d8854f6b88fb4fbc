"""plan_stats audit utility: counts agree with known plan shapes."""

from __future__ import annotations

from mandoline_hbase_spark.plans.audit import plan_stats
from mandoline_hbase_spark.queries.catalog import QUERIES
from tests.conftest import SF_SMOKE


def test_map_only_projection_stats(spark):
    s = plan_stats(QUERIES["emb_random_projection"].fn(spark, SF_SMOKE))
    assert s["shuffle_exchanges"] == 1  # the spread only
    assert s["python_evals"] == 0
    assert s["cartesian_products"] == 0
    assert s["file_scans"] == 1


def test_q6_pushdown_visible_in_stats(spark):
    s = plan_stats(QUERIES["q6_forecast_revenue"].fn(spark, SF_SMOKE))
    assert s["pushed_filters"], "q6 must push filters to the scan"
    assert s["cartesian_products"] == 0 and s["python_evals"] == 0


def test_join_query_uses_hash_strategies(spark):
    s = plan_stats(QUERIES["q3_shipping_priority"].fn(spark, SF_SMOKE))
    assert s["cartesian_products"] == 0 and s["nested_loop_joins"] == 0
    assert s["broadcast_hash_joins"] + s["sort_merge_joins"] + s["shuffled_hash_joins"] >= 1
