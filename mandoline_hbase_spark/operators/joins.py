"""Join operators Spark lacks natively: as-of join and interval range join.

The reference's one real query, ``find-index`` (hbase.clj:184-198), IS an
as-of lookup: "latest version <= bound per (var, coord)". This module
generalizes that MVCC resolution pattern into a reusable time-series
as-of join, plus an interval range join helper.

Scale design — the as-of join is the union+window merge, NOT a range
join: tag both inputs, union, repartition by the `by` keys, sort within
partition by (time, side), and carry the last-seen right row forward
with ``last(ignorenulls=True)``. One shuffle on the key — the same cost
as a plain equi-join — versus the quadratic blow-up of the naive
``left.ts >= right.ts`` theta join that a range join would plan. This is
how production time-series stores implement merge-as-of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_cols: list[str] | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (or ``<`` when allow_exact_matches=False),
    matching within the ``by`` key(s).

    Right payload columns come back nested under their own names (left
    columns win on collision — pass explicit ``right_cols`` to control
    the surface). Left rows with no prior right row keep NULLs, i.e.
    LEFT as-of semantics, same as DuckDB's ``ASOF LEFT JOIN``.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]

    # side ordering at equal timestamps: right first (0) so an exact-ts
    # right row is visible to the left row, unless exact matches are off
    right_side = 0 if allow_exact_matches else 2
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload")
    r = right.select(
        *by, F.col(on).alias("_asof_t"), F.lit(right_side).alias("_side"), payload
    )
    l = left.select(
        "*", F.col(on).alias("_asof_t"), F.lit(1).alias("_side"), F.lit(None).cast(
            r.schema["_asof_payload"].dataType
        ).alias("_asof_payload")
    )
    left_tagged = l
    right_tagged = r.select(
        *by,
        "_asof_t",
        "_side",
        "_asof_payload",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
    ).select(left_tagged.columns)

    merged = left_tagged.unionByName(right_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_asof_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = merged.withColumn(
        "_resolved", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_resolved.{c}").alias(c) for c in right_cols
    ]
    return resolved.filter(F.col("_side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str] | str,
    left_ts: str,
    right_ts: str,
    lower,
    upper,
) -> DataFrame:
    """Interval join: right rows with ``left_ts + lower <= right_ts <=
    left_ts + upper`` per key. Bounds are Column offsets (e.g.
    ``F.expr("INTERVAL 1 HOUR")``).

    Plans as an equi-join on the keys with the range as a post-join
    filter — correct everywhere; at extreme scale bucketize the time
    axis first so the equi-key includes the coarse bucket.
    """
    by = [by] if isinstance(by, str) else list(by)
    cond = None
    for k in by:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (right[right_ts] >= left[left_ts] + lower)
        & (right[right_ts] <= left[left_ts] + upper)
    )
    return left.join(right, cond, "inner")
