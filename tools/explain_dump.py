"""Dump `.explain("formatted")` for named catalog queries to text files.

    python tools/explain_dump.py OUT_DIR SUFFIX [sf_dir] name [name ...]

Writes OUT_DIR/<name>_<SUFFIX>.txt per query (e.g. plans/r10/, suffix
"before"/"after"). Mostly planning-only, but NOT guaranteed
side-effect-free: queries whose construction path runs eager work
(checkpoint_audited materializations — text_bigram_cms_estimate,
dedup_semantic_kmeans, the iterative dedup queries — or driver collects
like kmeans_fit / bpe_fit) execute real Spark jobs during the dump, so
do not run this concurrently with a timing-sensitive measurement on a
co-tenant box. The same tool run from a historical worktree produces
the "before" plans for an optimization round's evidence directory.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    if len(sys.argv) < 5:
        print(__doc__, file=sys.stderr)
        return 2
    out_dir, suffix = sys.argv[1], sys.argv[2]
    if os.path.isdir(sys.argv[3]):
        sf_dir, names = sys.argv[3], sys.argv[4:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from mandoline_hbase_spark.queries.catalog import QUERIES

    jvm = spark.sparkContext._jvm
    bad = 0
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            text = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(text)
            print(name, "ok", flush=True)
        except Exception as ex:  # noqa: BLE001 - dump every plan it can
            bad += 1
            print(name, "ERR", repr(ex)[:200], flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
