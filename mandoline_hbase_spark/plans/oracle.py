"""Local mirror of the driver's DuckDB-oracle compare.

Runs a Spark query and its ANSI-SQL oracle side by side and compares
row count, column names, and an order-insensitive value representation.
Used by the test suite so correctness regressions surface before the
driver's per-round gate does.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from mandoline_hbase_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and sub-epsilon representation jitter
        return round(v, 9) + 0.0
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo is not None else v
    return v


def _canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark: SparkSession, sf_dir: str, fn, oracle: str) -> dict:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pdf = con.execute(oracle).df()
    finally:
        con.close()

    result = {
        "rows_spark": len(spark_pdf),
        "rows_duck": len(duck_pdf),
        "cols_spark": sorted(spark_pdf.columns),
        "cols_duck": sorted(duck_pdf.columns),
    }
    result["rows_match"] = result["rows_spark"] == result["rows_duck"]
    result["cols_match"] = result["cols_spark"] == result["cols_duck"]
    result["values_match"] = (
        result["rows_match"]
        and result["cols_match"]
        and _canonical(spark_pdf) == _canonical(duck_pdf)
    )
    if not result["values_match"] and result["rows_match"] and result["cols_match"]:
        a, b = _canonical(spark_pdf), _canonical(duck_pdf)
        result["first_diff"] = next(
            ((x, y) for x, y in zip(a, b) if x != y), None
        )
    return result
