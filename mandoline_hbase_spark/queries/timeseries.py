"""Time-series catalog queries: grid resample with gap fill, SCD2
history, measure unpivot — each paired with an exact DuckDB oracle.

Parity notes: the resample aggregates with count/max only (float
sum/avg would diverge in the last ulp across engines under different
summation orders); days surface as 'yyyy-MM-dd' strings because DuckDB
DATE arrives in pandas as Timestamp while Spark DateType arrives as
date — strings compare engine-neutrally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import timeseries
from mandoline_hbase_spark.queries.catalog import register
from mandoline_hbase_spark.sources.tables import load_table


@register(
    "ts_resample_gap_fill",
    oracle=r"""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts)::DATE AS day,
                   count(*) AS n, max(value) AS day_max
            FROM events GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1
        ),
        grid_raw AS (
            SELECT user_id,
                   unnest(generate_series(CAST(lo AS TIMESTAMP),
                                          CAST(hi AS TIMESTAMP),
                                          INTERVAL 1 DAY)) AS gs
            FROM spans
        ),
        grid AS (
            SELECT user_id, CAST(gs AS DATE) AS day FROM grid_raw
        ),
        f AS (
            SELECT g.user_id, g.day, daily.n, daily.day_max
            FROM grid g
            LEFT JOIN daily ON daily.user_id = g.user_id AND daily.day = g.day
        )
        SELECT user_id,
               strftime(day, '%Y-%m-%d') AS day,
               coalesce(n, 0)::BIGINT AS n_events,
               (n IS NULL) AS is_gap,
               round(last_value(day_max IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS filled_max
        FROM f
    """,
    description=(
        "Per-user daily grid resample over each user's active span: gap "
        "days flagged and forward-filled (LOCF) with the last seen max"
    ),
    tags=("timeseries", "resample", "window"),
)
def ts_resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.resample_gap_fill(events)


@register(
    "ts_scd2_history",
    oracle=r"""
        WITH runs AS (
            SELECT user_id, event_type AS state, ts AS valid_from, event_id
            FROM (
                SELECT user_id, event_type, ts, event_id,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev
                FROM events
            )
            WHERE prev IS NULL OR prev <> state
        )
        SELECT user_id, state, valid_from,
               lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from, event_id
               ) AS valid_to,
               (lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from, event_id
               ) IS NULL) AS is_current
        FROM runs
    """,
    description=(
        "SCD type-2 history from the event stream: consecutive equal "
        "states collapse into [valid_from, valid_to) intervals per user"
    ),
    tags=("timeseries", "scd2", "window"),
)
def ts_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.scd2_history(events)


@register(
    "unpivot_lineitem_measures",
    oracle=r"""
        WITH m AS (
            SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val
            FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
        )
        SELECT l_returnflag, measure,
               round(sum(val), 2) AS total,
               count(*)::BIGINT AS n
        FROM m GROUP BY l_returnflag, measure
    """,
    description=(
        "Wide-to-long unpivot (melt) of four lineitem measures, then "
        "grouped totals — the inverse of the pivot query"
    ),
    tags=("relational", "unpivot"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    melted = lineitem.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return melted.groupBy("l_returnflag", "measure").agg(
        F.round(F.sum("val"), 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
