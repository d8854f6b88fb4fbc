"""Time-series operators: grid resampling with gap fill, SCD2 history.

Regular-grid resampling (downsample to a day grid, forward-fill gaps)
and slowly-changing-dimension (type-2) history construction are the two
canonical "stateful over time" reshapes an analytics engine needs; both
are pure window/sequence compositions here — no UDFs, shuffles keyed on
the series key only.

Determinism discipline: the resample aggregates with ``count`` and
``max`` (order-independent — a float ``sum``/``avg`` would diverge from
a scalar engine in the last ulp under different summation orders), and
every ordering includes a unique tiebreaker column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_gap_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key daily resample over each key's [min day, max day] span:
    one row per key per calendar day, ``n_events``/``day_max`` from that
    day's rows, gap days flagged and forward-filled with the last seen
    ``day_max`` (LOCF).

    Scale shape: two aggregations and one window, all keyed on
    ``key_col``; the grid explode is ``days_in_span`` rows per key —
    output-proportional, no cross-key work. The forward-fill window is
    per-key and ordered, so state is one row.
    """
    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(F.col(key_col), day.alias("day")).agg(
        F.count(F.lit(1)).alias("_n"), F.max(value_col).alias("_day_max")
    )
    spans = daily.groupBy(key_col).agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    filled = grid.join(daily, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col(key_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.col("_n").isNull().alias("is_gap"),
        F.round(F.last("_day_max", ignorenulls=True).over(w), 4).alias("filled_max"),
    )


def trailing_window_stats(
    df: DataFrame,
    days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing time-RANGE window (last ``days`` days up to and
    including the current event): event count and max value.

    The physical order key is microseconds (``unix_micros``), not a
    seconds cast — truncating to seconds silently moves boundary events
    in or out of the frame relative to engines that compare at full
    timestamp precision. RANGE frames keep state bounded by the time
    span per key; one shuffle on the key.
    """
    micros = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(micros)
        .rangeBetween(-days * 86_400 * 1_000_000, 0)
    )
    return df.select(
        F.col(id_col),
        F.col(key_col),
        F.count(F.lit(1)).over(w).cast("bigint").alias(f"n_{days}d"),
        F.max(value_col).over(w).alias(f"max_{days}d"),
    )


def value_histogram(
    df: DataFrame,
    bin_width: float = 10.0,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-width histogram per group: ``bin = floor(value / width)``,
    with count and exact bin bounds observed. One groupBy shuffle at
    (group, bin) grain — output is bins, never rows, so this is the
    scan-speed distribution profile for any column at any scale.
    """
    binv = F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint")
    return (
        df.groupBy(F.col(group_col), binv.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("bin_min"),
            F.max(value_col).alias("bin_max"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event stream: per
    key, collapse consecutive equal states into validity intervals
    ``[valid_from, valid_to)`` with an ``is_current`` flag on the open
    interval.

    One shuffle on the key; two ordered windows (lag to find run starts,
    lead to close intervals). ``tiebreak_col`` must be unique so
    same-timestamp events order identically on any engine.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    runs = (
        df.withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
        .select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.col(tiebreak_col).alias("_tb"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "_tb")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_tb")
    )
