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
