"""Profiling + expectations operator semantics the oracle can't isolate:
null handling, top-value tiebreaks, three-valued rule logic."""

from __future__ import annotations

from pyspark.sql import functions as F

from mandoline_hbase_spark.operators.profiling import (
    expectations_report,
    melt_to_long,
    profile_columns,
)


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 10.0),
            (3, "a", 20.0),
            (4, None, 20.0),
        ],
        "id BIGINT, cat STRING, v DOUBLE",
    )


def test_profile_counts_nulls_and_distinct(spark):
    prof = {r["column"]: r.asDict() for r in profile_columns(_fixture(spark), ["cat", "v"]).collect()}
    assert prof["cat"]["n_rows"] == 4
    assert prof["cat"]["n_null"] == 1
    assert prof["cat"]["n_distinct"] == 2  # nulls excluded from distinct
    assert prof["cat"]["top_value"] == "a" and prof["cat"]["top_count"] == 2
    assert prof["v"]["n_null"] == 1
    assert prof["v"]["top_value"] == "20.0" and prof["v"]["top_count"] == 2


def test_profile_top_value_tiebreak_is_value_asc(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",), ("a",)], "x STRING")
    row = profile_columns(df, ["x"]).collect()[0]
    # equal counts -> smallest value wins deterministically
    assert row["top_value"] == "a"


def test_profile_all_null_column_has_null_top(spark):
    df = spark.createDataFrame([(None,), (None,)], "x STRING")
    row = profile_columns(df, ["x"]).collect()[0]
    assert row["n_null"] == 2 and row["n_distinct"] == 0
    assert row["top_value"] is None and row["top_count"] is None


def test_melt_preserves_null_not_string_none(spark):
    long = melt_to_long(_fixture(spark), ["cat"]).collect()
    vals = [r["value"] for r in long]
    assert None in vals and "None" not in vals


def test_expectations_null_rule_counts_as_violation(spark):
    rep = {
        r["rule"]: r.asDict()
        for r in expectations_report(
            _fixture(spark),
            {
                "v_positive": F.col("v") > 0,  # NULL v -> violation
                "cat_not_null": F.col("cat").isNotNull(),
                "id_small": F.col("id") <= 4,
            },
        ).collect()
    }
    assert rep["v_positive"]["n_violations"] == 1  # the NULL row
    assert rep["cat_not_null"]["n_violations"] == 1
    assert rep["id_small"]["n_violations"] == 0
    assert rep["id_small"]["viol_pct"] == 0.0
    assert all(r["n_checked"] == 4 for r in rep.values())


def test_expectations_single_pass_plan(spark):
    """All rules ride ONE aggregate over one scan — no per-rule jobs."""
    df = _fixture(spark)
    rep = expectations_report(df, {"a": F.col("v") > 0, "b": F.col("id") > 1})
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1  # createDataFrame -> LocalTableScan; parquet -> 1 scan


def test_approx_profile_single_pass_and_bounds(spark):
    import pyspark.sql.functions as F

    from mandoline_hbase_spark.operators.profiling import profile_columns_approx

    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("cat"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 1.0).alias("v"),
    )
    prof = {r["column"]: r.asDict() for r in profile_columns_approx(df, ["id", "cat", "v"]).collect()}
    assert prof["cat"]["approx_distinct"] == 7  # tiny cardinality: exact
    assert abs(prof["id"]["approx_distinct"] - 5000) / 5000 < 0.15
    assert prof["v"]["n_null"] == 500
    assert all(p["n_rows"] == 5000 for p in prof.values())
    # one aggregate over one scan — no per-column jobs
    plan = profile_columns_approx(df, ["id", "cat"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2


def test_merkle_manifest_flips_on_any_change(spark):
    from mandoline_hbase_spark.operators.profiling import merkle_manifest

    rows = [(i, "s", f"text {i}") for i in range(40)]
    ddl = "doc_id bigint, source string, text string"
    base = merkle_manifest(
        spark.createDataFrame(rows, ddl), "source", n_shards=4
    ).collect()[0]
    assert base.n_docs == 40 and base.n_shards == 4
    # single-byte change in one doc flips the root
    rows2 = [(i, "s", "text X" if i == 17 else f"text {i}") for i in range(40)]
    changed = merkle_manifest(
        spark.createDataFrame(rows2, ddl), "source", n_shards=4
    ).collect()[0]
    assert changed.manifest_hash != base.manifest_hash
    # identical corpus reproduces the root exactly (order-insensitive)
    again = merkle_manifest(
        spark.createDataFrame(list(reversed(rows)), ddl), "source", n_shards=4
    ).collect()[0]
    assert again.manifest_hash == base.manifest_hash


def test_join_skew_report_hand_computed(spark):
    from mandoline_hbase_spark.operators.profiling import join_skew_report

    # key 'a' holds 6 of 10 rows; ties between 'b' and 'c' (2 each)
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = join_skew_report(df, ["k"]).collect()[0]
    assert r.n_rows == 10 and r.n_keys == 3
    assert r.top_key == "a" and r.top_cnt == 6
    assert r.top_share == 0.6
    # tie-break check: drop the 'a' rows -> top is the smaller of b/c
    r2 = join_skew_report(
        spark.createDataFrame(rows[6:], "k string"), ["k"]
    ).collect()[0]
    assert r2.top_key == "b" and r2.top_cnt == 2
