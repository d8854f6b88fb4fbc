"""Time-series + governance catalog queries: grid resample with gap
fill, SCD2 history, trailing RANGE windows, histograms, measure
unpivot, policy-masked views — each paired with an exact DuckDB oracle.

Parity notes: the resample aggregates with count/max only (float
sum/avg would diverge in the last ulp across engines under different
summation orders); days surface as 'yyyy-MM-dd' strings because DuckDB
DATE arrives in pandas as Timestamp while Spark DateType arrives as
date — strings compare engine-neutrally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import governance, timeseries
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
    "ts_trailing_7d_stats",
    oracle=r"""
        SELECT event_id, user_id,
               count(*) OVER w::BIGINT AS n_7d,
               max(value) OVER w AS max_7d
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
        )
    """,
    description=(
        "Per-event trailing 7-day RANGE window per user (count + max) — "
        "microsecond-precision frame bounds on both engines"
    ),
    tags=("timeseries", "window", "range"),
)
def ts_trailing_7d_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.trailing_window_stats(events, days=7)


@register(
    "ts_value_histogram",
    oracle=r"""
        SELECT event_type,
               CAST(floor(value / 10.0) AS BIGINT) AS bin,
               count(*)::BIGINT AS n,
               min(value) AS bin_min,
               max(value) AS bin_max
        FROM events
        GROUP BY event_type, CAST(floor(value / 10.0) AS BIGINT)
    """,
    description=(
        "Fixed-width value histogram per event type: floor-binned counts "
        "with observed bin bounds (exact distribution profile)"
    ),
    tags=("timeseries", "histogram", "aggregate"),
)
def ts_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.value_histogram(events, bin_width=10.0)


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


@register(
    "gov_masked_events",
    oracle=r"""
        SELECT event_id,
               sha256('corpus-salt' || CAST(user_id AS VARCHAR)) AS user_pseudonym,
               concat(substr(event_type, 1, 2), '***') AS event_type,
               value
        FROM events
        WHERE event_type <> 'purchase'
    """,
    description=(
        "Policy view: salted-SHA256 user pseudonyms (join-stable, "
        "unlinkable), prefix-masked event types, purchase rows filtered "
        "before projection so the predicate pushes to the scan"
    ),
    tags=("governance", "masking"),
)
def gov_masked_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    view = governance.masked_view(
        events,
        pseudonym_cols={"user_id": "corpus-salt"},
        mask_cols=("event_type",),
        drop_cols=("props", "ts"),
        row_filter=F.col("event_type") != "purchase",
    )
    return view.select(
        "event_id", F.col("user_id").alias("user_pseudonym"), "event_type", "value"
    )


@register(
    "gov_k_anonymity_events",
    oracle=r"""
        SELECT event_type,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               COUNT(*)::BIGINT AS n_rows,
               COUNT(DISTINCT user_id)::BIGINT AS n_sensitive,
               COUNT(*) >= 50 AS k_anonymous,
               COUNT(DISTINCT user_id) >= 20 AS l_diverse
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    """,
    description=(
        "Re-identification risk report (k-anonymity + l-diversity, "
        "Machanavajjhala et al.): per (event_type, day) equivalence "
        "class, row count and distinct-user count with k=50 / l=20 "
        "release-gate flags - the audit a governed lake runs BEFORE a "
        "masked view ships (quasi-identifiers can re-identify even "
        "after gov_masked_events' column policy). One aggregation; the "
        "exact distinct is the standard two-level (class, user) "
        "combine. operators/governance.py::k_anonymity_report"
    ),
    tags=("governance", "privacy", "k-anonymity"),
)
def gov_k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day as ISO string: Spark dates surface as python date objects but
    # DuckDB DATE as datetime64 - strings compare identically
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    return governance.k_anonymity_report(
        events, ["event_type", "day"], "user_id", k=50, l_distinct=20
    )


@register(
    "gov_dp_event_counts",
    oracle=r"""
        WITH c AS (
            SELECT event_type, count(*)::BIGINT AS n_true
            FROM events GROUP BY 1
        )
        SELECT event_type,
               round(n_true
                     + ln(((CAST(concat('0x', substr(md5(coalesce('v' ||
                               replace(replace(event_type, '\', '\\'), '|', '\|'),
                               'n') || ':dp-release:u1'), 1, 8)) AS BIGINT)
                            + 0.5) / 4294967296.0)
                          / ((CAST(concat('0x', substr(md5(coalesce('v' ||
                               replace(replace(event_type, '\', '\\'), '|', '\|'),
                               'n') || ':dp-release:u2'), 1, 8)) AS BIGINT)
                             + 0.5) / 4294967296.0))
                       / 1.0, 4) AS noisy_count,
               1.0 AS epsilon
        FROM c
        ORDER BY event_type
    """,
    description=(
        "Differentially-private count release (eps=1 Laplace mechanism) "
        "with DERANDOMIZED noise: uniforms derived from md5 over the "
        "class key + salt, ln(u1/u2) is exactly Laplace(1) across "
        "classes, so the same table + secret salt always publishes the "
        "same audited numbers — the reproducible-release form a governed "
        "lake needs (operators/governance.py::dp_noisy_counts documents "
        "the salt-secrecy / no-reuse caveat)"
    ),
    tags=("governance", "privacy", "differential-privacy"),
)
def gov_dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return governance.dp_noisy_counts(
        events, ["event_type"], epsilon=1.0, salt="dp-release"
    )


@register(
    "ts_seasonal_profile",
    oracle="""
        WITH g AS (
            SELECT event_type, dayofweek(ts)::INT AS dow,
                   count(*)::BIGINT AS n,
                   round(avg(value), 4) AS mean_value
            FROM events GROUP BY 1, 2
        ),
        t AS (SELECT event_type, sum(n) AS n_type FROM g GROUP BY 1)
        SELECT g.event_type, g.dow, g.n, g.mean_value,
               round(g.n / t.n_type, 6) AS share
        FROM g JOIN t USING (event_type)
        ORDER BY event_type, dow
    """,
    description=(
        "Day-of-week seasonal profile per event type (0=Sunday): row "
        "share and mean value per weekday cell — the baseline a "
        "seasonality-aware anomaly monitor compares against (pairs with "
        "events_outliers_mad, which is season-blind)"
    ),
    tags=("timeseries", "seasonal", "profile"),
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Spark dayofweek is 1=Sunday..7=Saturday; DuckDB's is 0=Sunday —
    # shift once here so both engines speak the DuckDB convention
    g = events.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )
    t = g.groupBy("event_type").agg(F.sum("n").alias("n_type"))
    return (
        g.join(t, "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            "mean_value",
            F.round(F.col("n") / F.col("n_type"), 6).alias("share"),
        )
        .orderBy("event_type", "dow")
    )
