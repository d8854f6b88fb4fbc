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


def test_checkpointed_iterative_queries_are_not_audit_blind(spark):
    """VERDICT r6 #5: localCheckpoint severs lineage, so without the
    collector the audit reports "no shuffles" for some of the most
    shuffle-expensive queries in the catalog. Through audit_catalog the
    per-round plans must be folded in: scans visible, shuffles at least
    one per recorded round."""
    from mandoline_hbase_spark.plans.audit import audit_catalog

    checkpointing = ["dedup_cluster_assign", "cluster_aware_split", "graph_pagerank"]
    # split_leakage_report does not checkpoint (its whole lineage is
    # analyzable) — it belongs in the sweep for non-emptiness only
    for entry in audit_catalog(spark, SF_SMOKE, names=checkpointing + ["split_leakage_report"]):
        assert entry["file_scans"] >= 1, entry["query"]
        assert entry["shuffle_exchanges"] >= 1, entry["query"]
        if entry["query"] in checkpointing:
            assert entry["iteration_plans"] >= 1, entry["query"]
            assert entry["shuffle_exchanges"] >= entry["iteration_plans"], entry["query"]


def test_committed_plan_audit_has_no_scanless_entries():
    """The machine-readable audit must never claim a query reads no
    files — that is the checkpoint-blindness signature."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLAN_AUDIT.json")
    plans = json.load(open(path))["plans"]
    assert plans
    scanless = [p["query"] for p in plans if p["file_scans"] == 0]
    assert scanless == [], scanless
