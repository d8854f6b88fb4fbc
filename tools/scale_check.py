"""Scale-step evidence as a CLI (VERDICT r6 #7): build an N× replica of
a testdata dir, run the bench protocol at both scales, and assert every
per-query ratio stays under a cap.

Subcommands
-----------

``build``          10× key-offset replica (the round-6 hand-run scheme,
                   now reproducible): per-copy key offsets keep join
                   semantics (region/nation stay fixed — TPC-H
                   dimension semantics), per-copy text suffix and
                   per-element embedding jitter keep dedup/ANN
                   workloads from collapsing into cross-copy duplicate
                   clusters.

``build-heaps``    same replica, but document text is REWRITTEN with a
                   Zipf(1) token distribution over a Heaps-law-sized
                   vocabulary (V ≈ 22·T^0.49 for T corpus tokens, the
                   classic English fit) — the realistic-vocabulary
                   corpus VERDICT r6 #2 asks for. Doc token counts are
                   preserved; only the vocabulary realism changes. Use
                   ``--copies 1`` for the base-scale twin so ratios
                   compare like against like.

``measure``        bench protocol (warm pass, then min of two timed
                   noop-sink passes — bench.py's) for the chosen
                   queries at a base dir and a scaled dir; prints the
                   ratio table, writes a JSON artifact, exits 1 if any
                   ratio ≥ the cap.

Loud-exit discipline (tools/sweep.py conventions): unknown query names
and missing directories exit 2 — a typo must never produce a
zero-query false green — and the sf label is best-effort but can never
lose the artifact.

Examples::

    python tools/scale_check.py build --out /tmp/sfdata/sf1
    python tools/scale_check.py measure --base /root/testdata/sf0.1 \
        --scaled /tmp/sfdata/sf1 --queries top12 --write BENCH_SF1.json
    python tools/scale_check.py build-heaps --copies 1 --out /tmp/sfdata/sf0.1h
    python tools/scale_check.py build-heaps --copies 10 --out /tmp/sfdata/sf1h
    python tools/scale_check.py measure --base /tmp/sfdata/sf0.1h \
        --scaled /tmp/sfdata/sf1h --queries dedup_prefix_filter
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# per-copy key offsets, chosen >> each key's base domain so copies can
# never collide; FK columns shift together so joins stay valid per copy
_OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}


def _spark():
    from mandoline_hbase_spark.session import get_spark

    return get_spark(app_name="scale-check")


def _copy_expr(df, table: str, i: int, heaps_vocab: int | None):
    from pyspark.sql import functions as F

    cols = []
    for name, dtype in df.dtypes:
        c = F.col(name)
        off = _OFFSETS.get(table, {}).get(name)
        if off:
            c = (c + F.lit(off * i)).cast(dtype)
        elif table == "documents" and name == "text":
            if heaps_vocab is not None:
                # rewrite every token: Zipf(1) over a Heaps-sized vocab.
                # Inverse-CDF in log space (rank = V^u for u~U[0,1))
                # gives P(rank) ∝ 1/rank. u is keyed on the ORIGINAL
                # (previous token, token, position, copy) — content+
                # position keying makes identical aligned source text
                # rewrite identically, so the fixture's within-copy
                # near-dup pairs survive verbatim (measured: all 256
                # sf0.1 prefix-filter pairs preserved), the bigram
                # context lifts the output entropy to Heaps scale, and
                # folding the copy index makes copies mutually
                # independent (constant dup RATE at 10×, not 10
                # mirrors). Deterministic build, no RNG.
                toks = F.split(F.trim(c), r"\s+")
                prev = lambda pos: F.element_at(toks, F.greatest(pos - 1, F.lit(1)))
                u = lambda pos: (
                    F.pmod(
                        F.xxhash64(prev(pos), F.element_at(toks, pos), pos, F.lit(i)),
                        1_000_000,
                    )
                    / 1_000_000.0
                )
                tok = lambda pos: F.concat(
                    F.lit("t"),
                    F.floor(F.pow(F.lit(float(heaps_vocab)), u(pos))).cast("string"),
                )
                c = F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))), tok
                    ),
                    " ",
                )
            elif i > 0:
                c = F.concat(c, F.lit(f" rep{i}tok"))
        elif table == "customer" and name == "c_acctbal" and i > 0:
            # jitter balances per copy so copies are mutually independent
            # under the ER balance-gap predicate (same reason text and
            # embeddings are perturbed: identical copies make the true
            # near-dup/match answer quadratic in copies — a fixture
            # artifact, not a plan property). Keyed on the copy's FINAL
            # unique custkey, so the jitter stays independent at any
            # CHAIN depth (a constant per-copy shift collides again when
            # shift sums repeat across chained builds: i1+i2 == j1+j2).
            uniq = F.col("c_custkey") + F.lit(1_000_000 * i)
            c = (
                c
                + F.pmod(F.xxhash64(uniq, F.lit("bal-jitter")), 1_000_000)
                / 100.0
            ).cast(dtype)
        elif table == "embeddings" and name == "embedding" and i > 0:
            # per-element multiplicative jitter up to ±2% per copy step:
            # copies drift progressively apart so ANN cells and near-dup
            # clusters scale like fresh data, not 10 mirrors
            c = F.transform(
                c,
                lambda x, j: (
                    x
                    * (
                        1.0
                        + i
                        * (
                            (F.pmod(F.xxhash64(F.col("vec_id"), j), 41) - 20)
                            / 1000.0
                        )
                    )
                ).cast("float"),
            )
        cols.append(c.alias(name))
    return df.select(*cols)


def _heaps_vocab_size(spark, base: str, copies: int) -> int:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    t_base = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    total_tokens = int(t_base) * copies
    return max(100, int(22 * total_tokens**0.49))  # Heaps: K·T^β


def cmd_build(args, heaps: bool) -> int:
    if not os.path.isdir(args.base):
        print(f"error: base dir {args.base!r} does not exist", file=sys.stderr)
        return 2
    spark = _spark()
    vocab = _heaps_vocab_size(spark, args.base, args.copies) if heaps else None
    if heaps:
        print(f"heaps vocabulary size: {vocab}")
    os.makedirs(args.out, exist_ok=True)
    for table in TABLES:
        src = spark.read.parquet(os.path.join(args.base, f"{table}.parquet"))
        if table in ("region", "nation"):
            out = src  # fixed dimensions
        else:
            from functools import reduce

            parts = [
                _copy_expr(src, table, i, vocab if table == "documents" else None)
                for i in range(args.copies)
            ]
            out = reduce(lambda a, b: a.unionByName(b), parts)
        n_files = max(1, args.copies * (4 if table == "lineitem" else 1))
        dest = os.path.join(args.out, f"{table}.parquet")
        out.repartition(n_files).write.mode("overwrite").parquet(dest + ".tmp")
        # directory-form parquet is fine for every reader in this repo;
        # atomic rename so a crashed build never half-populates the name
        if os.path.exists(dest):
            import shutil

            shutil.rmtree(dest) if os.path.isdir(dest) else os.unlink(dest)
        os.rename(dest + ".tmp", dest)
        print(f"built {table}: {out.count()} rows -> {dest}")
    return 0


TOP12 = [
    "sim_ivf_ann_topk", "cluster_aware_split", "dedup_prefix_filter",
    "sim_pq_ann_topk", "dedup_cluster_assign", "recursive_order_chains",
    "sim_lsh_ann_topk", "graph_pagerank", "split_leakage_report",
    "dedup_fuzzy_segments", "q9_profit_by_nation_year", "dedup_minhash_lsh",
]


def _timed(spark, fn, sf_dir: str) -> float:
    # bench.py's protocol, shared so ratios stay comparable with the
    # headline record (warm pass, min of two timed noop-sink passes)
    from bench import timed_min

    return timed_min(spark, fn, sf_dir)


def cmd_measure(args) -> int:
    from mandoline_hbase_spark.queries.catalog import QUERIES
    from bench import HEADLINE  # noqa: F401  (repo root on sys.path)

    for d in (args.base, args.scaled):
        if not os.path.isdir(d):
            print(f"error: dir {d!r} does not exist", file=sys.stderr)
            return 2
    if args.queries == ["top12"]:
        names = TOP12
    elif args.queries == ["all"]:
        names = list(HEADLINE)
    else:
        names = args.queries
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"error: unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = _spark()
    rows = {}
    for name in names:
        fn = QUERIES[name].fn
        b = _timed(spark, fn, args.base)
        s = _timed(spark, fn, args.scaled)
        ratio = s / b if b > 0 else float("inf")
        rows[name] = {
            "base_s": round(b, 3),
            "scaled_s": round(s, 3),
            "ratio": round(ratio, 2),
        }
        print(f"{name:35s} {b:8.2f}s {s:8.2f}s  x{ratio:5.2f}")

    worst = max(rows.values(), key=lambda r: r["ratio"])
    total_b = round(sum(r["base_s"] for r in rows.values()), 3)
    total_s = round(sum(r["scaled_s"] for r in rows.values()), 3)
    out = {
        "metric": f"scale-step wall time ({args.base} -> {args.scaled})",
        "unit": "sec",
        "value": total_s,
        "base_value": total_b,
        "ratio_cap": args.ratio_cap,
        "queries": {n: r["scaled_s"] for n, r in rows.items()},
        "ratios": rows,
    }
    # best-effort sf label — a label failure must never lose the artifact
    import re

    m = re.search(r"sf([\d.]+)", os.path.basename(args.scaled.rstrip("/")))
    try:
        out["sf"] = float(m.group(1).rstrip(".")) if m else None
    except ValueError:
        out["sf"] = None
    path = os.path.join(REPO, args.write) if args.write else None
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {path}")
    print(
        f"total {total_b:.1f}s -> {total_s:.1f}s "
        f"(x{total_s / total_b:.2f}); worst query ratio x{worst['ratio']:.2f}"
    )
    bad = [n for n, r in rows.items() if r["ratio"] >= args.ratio_cap]
    if bad:
        print(f"FAIL: ratio >= {args.ratio_cap}x for {bad}", file=sys.stderr)
        return 1
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("build", "build-heaps"):
        b = sub.add_parser(cmd)
        b.add_argument("--base", default="/root/testdata/sf0.1")
        b.add_argument("--out", required=True)
        b.add_argument("--copies", type=int, default=10)
    m = sub.add_parser("measure")
    m.add_argument("--base", default="/root/testdata/sf0.1")
    m.add_argument("--scaled", required=True)
    m.add_argument("--queries", nargs="+", default=["top12"])
    m.add_argument("--ratio-cap", type=float, default=10.0)
    m.add_argument("--write", default=None)
    args = p.parse_args()
    if args.cmd == "build":
        return cmd_build(args, heaps=False)
    if args.cmd == "build-heaps":
        return cmd_build(args, heaps=True)
    return cmd_measure(args)


if __name__ == "__main__":
    raise SystemExit(main())
