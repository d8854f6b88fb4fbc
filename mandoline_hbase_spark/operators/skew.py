"""Skew mitigation: salted equi-join.

AQE's skew-join split (spark.sql.adaptive.skewJoin, on by default in
session.py) handles most skew at runtime by splitting oversized shuffle
partitions. Salting is the static fallback for the pathological case AQE
can't fix: ONE key so hot that even a split partition pins a single
reducer — e.g. a null-ish default key holding 10% of 100 TB.

``salted_join`` spreads each hot left key over ``n_salts`` shuffle
partitions and replicates the matching right rows once per salt: the
shuffle cost rises by |right| x (n_salts - 1) rows, the hot reducer
shrinks by n_salts x. Worth it exactly when the right side is the small
one — which is the usual dimension-join skew shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's keys salted ``n_salts`` ways.

    The salt is derived from a per-row id (not the key!), so rows of one
    hot key scatter uniformly; the right side is exploded once per salt
    value. Result is row-identical to ``left.join(right, on, how)``.
    """
    on = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(salted_right, on + ["_salt"], how)
    return out.drop("_salt")


def spread_to_parallelism(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key_col`` up to session parallelism —
    ONLY when the incoming plan has fewer partitions than cores.

    Purpose: per-row heavy map work (signature folds, window explodes,
    rerank math) after a small scan. A local fixture parquet is one
    split, and a broadcast join executes inside the scan's stage, so
    without a spread the whole stage runs on one core. At real scale the
    scan already has more splits than cores and the spread would be a
    full shuffle of the payload for nothing — the partition-count check
    (driver-side plan metadata, no job) makes it a true no-op there.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key_col)
