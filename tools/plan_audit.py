"""Regenerate PLAN_AUDIT.json: structural plan statistics for every
oracle-backed catalog query at the oracle scale factor.

    python tools/plan_audit.py [sf_dir]

Writes PLAN_AUDIT.json at the repo root and prints the red-flag
summary (cartesian products must be zero; nested-loop and python-eval
plans are enumerated for the guard allowlists to adjudicate).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from mandoline_hbase_spark.plans.audit import audit_catalog

    import re

    plans = audit_catalog(spark, sf_dir)
    # best-effort provenance label; NEVER allowed to lose the audit —
    # any unfloatable match (sf0.0.1, sf.) degrades to None
    m = re.search(r"sf([\d.]+)", os.path.basename(sf_dir.rstrip("/")))
    try:
        sf = float(m.group(1).rstrip(".")) if m else None
    except ValueError:
        sf = None
    out = {"n_queries": len(plans), "plans": plans, "sf": sf}
    path = os.path.join(repo, "PLAN_AUDIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    cart = [p["query"] for p in plans if p["cartesian_products"]]
    print("plans:", len(plans), "->", path)
    print("cartesian products:", cart or "none")
    print("nested-loop plans:", sum(1 for p in plans if p["nested_loop_joins"]))
    print("python-eval plans:", [p["query"] for p in plans if p["python_evals"]])
    return 1 if cart else 0


if __name__ == "__main__":
    raise SystemExit(main())
