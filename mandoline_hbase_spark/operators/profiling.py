"""Data profiling and data-quality expectations.

Two warehouse primitives every ingest pipeline runs before training:

- :func:`profile_columns` — ANALYZE-style per-column statistics
  (row/null/distinct counts, min/max, top value) in a COLUMN-COUNT-
  INDEPENDENT number of passes: the table is melted to long format
  (column, value) with one generated ``stack``-style projection, so
  profiling 5 or 500 columns is the same two shuffles (one per-value
  aggregate, one per-column rollup). The naive per-column loop — one
  groupBy per column — is 2×n_cols scans at 100 TB.

- :func:`expectations_report` — declarative row-level constraint checks
  (Great-Expectations-style) evaluated in ONE conditional-aggregation
  pass: every rule is a ``count_if(NOT rule)`` over the same scan, so
  adding rules adds columns to one aggregate, never passes. Map-side
  partial aggregation means the shuffle carries one row per partition.

Both emit small summary tables (output ∝ columns/rules, not rows) and
are exact, so they oracle-check against DuckDB; the approximate twins
for interactive profiling at scale (``approx_count_distinct``, sketch
top-k) live in ``operators/kmv.py`` / ``functions``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def melt_to_long(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, value) long form of the selected columns, values as
    strings (engine-neutral; NULL stays NULL, not the string 'None')."""
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile: rows, nulls, exact distinct, min/max (string
    order), most frequent value (count-desc, value-asc tiebreak).

    Plan shape: melt (map-only explode) → groupBy (column, value)
    [shuffle 1, map-side combined] → per-column aggregate + top-k window
    over the value-grain table [shuffle 2 on column]. Both shuffles are
    keyed on (column[, value]) so a wide table parallelizes across the
    cluster; no per-column jobs, no driver loop.
    """
    long = melt_to_long(df, cols)
    per_value = long.groupBy("column", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("column").orderBy(F.desc("cnt"), F.asc("value"))
    # rank only non-null values: a column whose most frequent value is
    # NULL still reports its most frequent real value as top_value
    ranked = per_value.filter(F.col("value").isNotNull()).withColumn(
        "rk", F.row_number().over(w)
    )
    stats = per_value.groupBy("column").agg(
        F.sum(F.when(F.col("value").isNotNull(), F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_non_null"
        ),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(F.lit(0))).alias("n_null"),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1))).alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    top = (
        ranked.filter(F.col("rk") == 1)
        .select(
            "column",
            F.col("value").alias("top_value"),
            F.col("cnt").alias("top_count"),
        )
    )
    return stats.join(top, "column", "left").select(
        "column",
        (F.col("n_non_null") + F.col("n_null")).alias("n_rows"),
        "n_null",
        "n_distinct",
        "min_value",
        "max_value",
        "top_value",
        "top_count",
    )


def expectations_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-pass constraint report: for each named rule (a boolean
    Column over the input row), the number of rows checked, the number
    violating (rule false OR null — SQL three-valued logic counts an
    unevaluable rule as a violation, matching NOT-NULL intuition), and
    the violation rate.

    Output is long format (rule, n_checked, n_violations, viol_pct),
    one row per rule, built from a single aggregate: adding a rule adds
    two expressions to the same scan — never another pass. The final
    explode of the k-element summary array is driver-free.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, rule in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(rule, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
            ).alias(f"_v_{name}")
        )
    one = df.agg(*aggs)
    summary = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("_n").alias("n_checked"),
                        F.col(f"_v_{name}").alias("n_violations"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    )
    return summary.select(
        "r.rule",
        "r.n_checked",
        "r.n_violations",
        F.round(F.col("r.n_violations") * 100.0 / F.col("r.n_checked"), 4).alias("viol_pct"),
    )


def profile_columns_approx(df: DataFrame, cols: list[str], rsd: float = 0.05) -> DataFrame:
    """Scale-path profile: ONE aggregate pass over the scan — per column
    row/null counts, approximate distinct (HLL++, ``rsd`` relative
    error), min/max as strings. No melt, no value-grain shuffle: where
    :func:`profile_columns` materializes one row per (column, value) —
    exact, oracle-checkable, but O(Σ column cardinality) shuffle — this
    ships one partial-aggregate row per partition regardless of
    cardinality. Use exact for audits, approx for interactive profiling
    of near-unique columns at corpus scale. Top values come from the
    sketch operators (``kmv.topk_heavy_hitters``) when needed."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        sc = F.col(c).cast("string")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.approx_count_distinct(c, rsd).alias(f"_dist_{c}"),
            F.min(sc).alias(f"_min_{c}"),
            F.max(sc).alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("_n").alias("n_rows"),
                        F.col(f"_null_{c}").cast("long").alias("n_null"),
                        F.col(f"_dist_{c}").alias("approx_distinct"),
                        F.col(f"_min_{c}").alias("min_value"),
                        F.col(f"_max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("r")
    ).select("r.*")


def join_skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-join-key skew diagnostics: the pre-flight a 100 TB join runs.

    For each candidate key column: key cardinality, the heaviest key and
    its share of all rows, and the p99/p50 ratio of per-key counts —
    the number that says whether AQE skew-join / salting is needed
    before the shuffle is launched. One count aggregation per key
    column (key-grain shuffle), then scalar aggregates over the
    (bounded, vocabulary-sized) count table; output is one row per key
    column.

    Tie-break: the heaviest key with the smallest string value wins, so
    the report is deterministic under count ties.
    """
    reports = []
    for key in key_cols:
        counts = df.groupBy(F.col(key).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = Window.orderBy(F.desc("cnt"), F.asc("k"))
        top = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("k").alias("top_key"), F.col("cnt").alias("top_cnt")
            )
        )
        agg = counts.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.expr("percentile(cnt, 0.5)").alias("_p50"),
            F.expr("percentile(cnt, 0.99)").alias("_p99"),
        )
        reports.append(
            agg.crossJoin(F.broadcast(top)).select(
                F.lit(key).alias("key_name"),
                "n_rows",
                "n_keys",
                "top_key",
                F.col("top_cnt").cast("bigint").alias("top_cnt"),
                F.round(F.col("top_cnt") / F.col("n_rows"), 6).alias(
                    "top_share"
                ),
                F.round(F.col("_p50"), 4).alias("p50_cnt"),
                F.round(F.col("_p99"), 4).alias("p99_cnt"),
                F.round(F.col("_p99") / F.col("_p50"), 4).alias(
                    "skew_p99_p50"
                ),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("key_name")


def merkle_manifest(
    df: DataFrame,
    group_col: str,
    *,
    id_col: str = "doc_id",
    content_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Hierarchical Merkle manifest per group: tamper-evident corpus
    versioning.

    Leaf = md5(content); shard digest = md5 over the shard's leaves
    concatenated in id order; group root = md5 over the shard digests
    in shard order. Any single-byte change to any document flips the
    group root, and two corpora can be compared shard-by-shard to find
    WHERE they diverge without re-reading content.

    100 TB shape: the leaf pass is map-side; both digest levels are
    grain-bounded aggregations (shard grain, then group grain with
    ``n_shards`` rows per group). Per-shard concatenation is the only
    memory term — pick ``n_shards`` so shards stay list-aggregable
    (at real scale: one shard per file/partition, a deeper tree for
    wider corpora; the two-level fold here is the recursion step).
    """
    leaves = df.select(
        F.col(group_col).alias("grp"),
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        F.col(id_col).alias("_id"),
        F.md5(F.col(content_col)).alias("leaf"),
    )
    shard_digest = leaves.groupBy("grp", "shard").agg(
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_id", "leaf"))),
                    lambda s: s["leaf"],
                ),
            )
        ).alias("digest"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    return (
        shard_digest.groupBy("grp")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("shard", "digest"))
                        ),
                        lambda s: s["digest"],
                    ),
                )
            ).alias("manifest_hash"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_shards",
            "manifest_hash",
        )
        .orderBy(group_col)
    )
