"""Distributed global ranking: exact row_number / ntile without a
single-partition window.

``Window.orderBy(...)`` with no partitionBy moves the whole table onto
ONE task — correct, but the canonical 100 TB scale-killer (Spark itself
warns "Moving all data to a single partition"). These operators compute
the same exact answers with the classic two-pass distributed ranking:

1. ``repartitionByRange`` on the sort key — one range shuffle, every
   partition holds a contiguous key range in partition-id order;
2. a per-partition ``row_number`` window (local sort, no exchange);
3. per-partition row counts prefix-summed into offsets — driver state is
   ONE LONG PER PARTITION (k-bounded, like the ANN centroid collects),
   never per-row.

``global rank = offset[partition] + local row_number`` is exact because
range partitions are disjoint and ordered; the sort key must be a total
order (add a unique tiebreaker column) so ranks are well defined.

The repartitioned frame is materialized with an eager localCheckpoint
before the counts job: both the offsets and the ranked output must see
the SAME partition boundaries, and range-partitioner sampling across two
separate jobs is not contractually stable. The checkpoint is the same
executor-side materialization the connected-components rounds use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.column import Column

from mandoline_hbase_spark.plans.audit import checkpoint_audited


def _ranked_with_total(
    df: DataFrame, order: list[Column], out_col: str, num_partitions: int | None
) -> tuple[DataFrame, int]:
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    d = checkpoint_audited(
        df.repartitionByRange(n_part, *order).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in d.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("bigint")), 0
    off = F.create_map(*[F.lit(x) for pid_acc in offsets.items() for x in pid_acc])[
        F.col("_pid")
    ]
    w = Window.partitionBy("_pid").orderBy(*order)
    ranked = d.withColumn(
        out_col, (off + F.row_number().over(w)).cast("bigint")
    ).drop("_pid")
    return ranked, acc


def with_global_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number over ``order`` (must be a total
    order), computed with a range shuffle + per-partition windows instead
    of a single-partition global window."""
    ranked, _ = _ranked_with_total(df, order, out_col, num_partitions)
    return ranked


def ntile_from_rank(rank: Column, n_rows: int, n_buckets: int) -> Column:
    """The exact SQL ``ntile`` bucket for a 1-based global ``rank``:
    the first ``n_rows % n_buckets`` buckets get ``n_rows // n_buckets
    + 1`` rows, the rest one fewer — identical to the window function,
    as a map-only expression."""
    base = n_rows // n_buckets
    rem = n_rows % n_buckets
    big = rem * (base + 1)
    return (
        F.when(rank <= F.lit(big), F.floor((rank - 1) / F.lit(base + 1)))
        .otherwise(F.lit(rem) + F.floor((rank - 1 - F.lit(big)) / F.lit(max(base, 1))))
        + 1
    ).cast("bigint")


def with_global_ntile(
    df: DataFrame,
    n_buckets: int,
    order: list[Column],
    out_col: str = "bin",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``ntile(n_buckets)`` over ``order`` (a total order),
    with no single-partition window in the plan."""
    ranked, n_rows = _ranked_with_total(df, order, "_grank", num_partitions)
    if n_rows == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("bigint")).drop("_grank")
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("_grank"), n_rows, n_buckets)
    ).drop("_grank")
