"""Physical-plan audit: structural statistics from an executed plan.

``plan_stats(df)`` distills ``df.explain("formatted")`` into the counts
that matter for the 100 TB question — how many shuffles, which join
strategies, whether filters reached the scan, whether any Python
evaluation interrupts whole-stage codegen. The plan-guard tests assert
on these; users call it interactively the way they'd eyeball
``.explain`` output.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_stats(df: DataFrame) -> dict[str, Any]:
    """Structural counts for a DataFrame's physical plan."""
    plan = _plan_string(df)
    scans = re.findall(r"FileScan \w+ \[([^\]]*)\]", plan)
    # the tree string truncates long filter lists mid-entry ("...,"),
    # so capture up to the closing bracket OR the truncation marker
    pushed = re.findall(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan)
    return {
        "shuffle_exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning"),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "sorts": plan.count("Sort "),
        "window_ops": plan.count("Window"),
        "python_evals": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "file_scans": len(scans),
        "scan_columns": [s for s in scans],
        "pushed_filters": [p for p in pushed if p],
        "take_ordered": plan.count("TakeOrderedAndProject"),
    }


def audit_catalog(spark, sf_dir: str, names: list[str] | None = None) -> list[dict]:
    """Run ``plan_stats`` across catalog queries (all oracle-backed ones
    by default); returns one dict per query, name included — the
    machine-readable twin of PERFORMANCE.md's plan-audit table."""
    from mandoline_hbase_spark.queries.catalog import QUERIES

    picked = names or [n for n, q in QUERIES.items() if q.oracle is not None]
    out = []
    for name in picked:
        stats = plan_stats(QUERIES[name].fn(spark, sf_dir))
        stats["query"] = name
        out.append(stats)
        spark.catalog.clearCache()
    return out
