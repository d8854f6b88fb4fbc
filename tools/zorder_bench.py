"""Z-order pruning benchmark (VERDICT r7 stretch #9).

Ingest the ``events`` fixture as a mandoline record variable, then
measure point-get / single-dimension range / two-dimension box queries
through the datasource's opt-in zone-map pruning
(``option("filter_pruning", "true")``) under three layouts:

- ``unclustered``   — round-robin chunks (ingest debris): min/max
                      ranges span the whole domain, nothing prunes;
- ``lex(event_id)`` — ``layout.cluster_records(["event_id"])``:
                      prunes the leading column only;
- ``zorder``        — ``layout.zorder_cluster_records(event_id,
                      user_id)``: every chunk covers a tight box in
                      BOTH dimensions, so either column's predicate
                      prunes.

Observables per (layout, query): ``chunks`` — the number of chunk
tasks the pruned plan schedules (``rdd.getNumPartitions()`` of the
filtered load, the same probe tests/test_datasource.py pins) — and
``sec`` — warm-then-min-of-2 wall of a noop-sink execution (bench.py's
protocol). Writes one JSON (``--write BENCH_ZORDER.json``).

Usage::

    python tools/zorder_bench.py [--sf-dir /tmp/sfdata/sf1] \
        [--out /tmp/zorder-bench] [--write BENCH_ZORDER.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGET_ROWS = 31_250  # 1M rows -> 32 chunks at sf1


def _timed(spark, df) -> float:
    # THE shared measurement protocol (warm + min-of-2 noop-sink with
    # cache clears), same as scale_check — timings stay comparable
    from bench import timed_min

    return timed_min(spark, lambda _s, _d: df, "")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/tmp/sfdata/sf1")
    p.add_argument("--out", default="/tmp/zorder-bench")
    p.add_argument("--write", default=None)
    p.add_argument("--target-rows", type=int, default=TARGET_ROWS)
    args = p.parse_args()
    events_src = os.path.join(args.sf_dir, "events.parquet")
    if not os.path.exists(events_src):
        print(f"error: {events_src} does not exist", file=sys.stderr)
        return 2

    from mandoline_hbase_spark import layout, mk_schema
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources import register_datasource

    spark = get_spark(app_name="zorder-bench")
    register_datasource(spark)
    events = spark.read.parquet(events_src).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = events.count()
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    schema = mk_schema(
        {"root": "zorder.bench.local", "base_path": args.out}, spark=spark
    )
    schema.create_dataset("events")
    ds_dir = schema.connect("events").dataset_dir
    k = max(1, -(-n // args.target_rows))
    (
        events.repartition(k)  # round-robin: the unclustered ingest shape
        .write.format("mandoline")
        .option("path", ds_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )

    # anchor every predicate on ONE real row so the box is never a
    # cross-copy empty intersection, and size the ranges off the
    # observed domains so selectivity is comparable across corpora
    anchor = events.orderBy("event_id").offset(n // 2).limit(1).first()
    eid, uid = int(anchor["event_id"]), int(anchor["user_id"])
    eid_span = int(events.selectExpr("max(event_id) - min(event_id)").first()[0])
    uid_span = int(events.selectExpr("max(user_id) - min(user_id)").first()[0])
    queries = {
        "point_event_id": f"event_id = {eid}",
        "range_user_id": (
            f"user_id BETWEEN {uid} AND {uid + max(1, uid_span // 12)}"
        ),
        "box_both": (
            f"event_id BETWEEN {eid} AND {eid + max(1, eid_span // 20)} "
            f"AND user_id BETWEEN {uid} AND {uid + max(1, uid_span // 12)}"
        ),
    }

    def load():
        return (
            spark.read.format("mandoline")
            .option("path", ds_dir)
            .option("variable", "records")
            .option("form", "records")
            .option("filter_pruning", "true")
            .load()
        )

    def measure() -> dict:
        out = {}
        for name, pred in queries.items():
            df = load().filter(pred)
            out[name] = {
                "chunks": int(df.rdd.getNumPartitions()),
                "rows": int(df.count()),
                "sec": round(_timed(spark, df), 3),
            }
        return out

    results = {"n_rows": int(n), "n_chunks": int(k), "queries": queries, "layouts": {}}
    results["layouts"]["unclustered"] = measure()
    layout.cluster_records(
        spark, ds_dir, ["event_id"], target_rows=args.target_rows
    )
    results["layouts"]["lex_event_id"] = measure()
    layout.zorder_cluster_records(
        spark, ds_dir, "event_id", "user_id", target_rows=args.target_rows, bits=27
    )
    results["layouts"]["zorder"] = measure()

    for layout_name, rows in results["layouts"].items():
        for qname, r in rows.items():
            print(
                f"{layout_name:14s} {qname:16s} chunks={r['chunks']:3d} "
                f"rows={r['rows']:6d} {r['sec']:6.3f}s"
            )
    if args.write:
        path = os.path.join(REPO, args.write)
        with open(path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
