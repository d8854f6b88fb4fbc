"""Version-diff analytics over the MVCC store.

``changed_coords`` answers "which chunks did commit range (v_old, v_new]
touch" from the index log alone — no chunk IO; ``diff_versions`` joins
the two snapshots' tidy views to emit CELL-level differences (changed,
added, removed), fully distributed.

Both compose from the same primitives the read path uses
(``chunk_map_df`` / ``tidy_view``, the vectorized find-index of
hbase.clj:184-198), so the diff inherits commit-point visibility: rows
of crashed, never-committed versions are invisible to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def changed_coords(conn, var_name: str, v_old: int, v_new: int, spark=None) -> DataFrame:
    """Coordinate-level diff from the chunk maps at the two bounds:
    ``(coord_id, chunk_id_old, chunk_id_new, change)`` where change is
    'added' | 'removed' | 'rewritten'. Unchanged coords (same
    content-addressed chunk id — including physically rewritten but
    byte-identical chunks) do not appear. Index-log work only, no chunk
    payload is read.
    """
    spark = spark or conn.spark
    old = conn.chunk_map_df(var_name, v_old, spark).select(
        "coord_id", F.col("chunk_id").alias("chunk_id_old")
    )
    new = conn.chunk_map_df(var_name, v_new, spark).select(
        "coord_id", F.col("chunk_id").alias("chunk_id_new")
    )
    joined = old.join(new, "coord_id", "full_outer")
    return joined.filter(
        ~F.col("chunk_id_old").eqNullSafe(F.col("chunk_id_new"))
    ).select(
        "coord_id",
        "chunk_id_old",
        "chunk_id_new",
        F.when(F.col("chunk_id_old").isNull(), F.lit("added"))
        .when(F.col("chunk_id_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("rewritten"))
        .alias("change"),
    )


def diff_versions(conn, var_name: str, v_old: int, v_new: int, spark=None) -> DataFrame:
    """Cell-level diff between two snapshots: one row per cell whose
    value differs (NaN == NaN for this purpose — fill cells do not churn
    the diff), with ``value_old`` / ``value_new`` null for cells present
    in only one snapshot (grow/shrink) and a change tag.

    Distributed end to end: two tidy views (index window + chunk decode)
    full-outer joined on the dimension key. At scale, feed
    :func:`changed_coords` into the tidy views' region pruning to decode
    only touched chunks; the full join here is the exhaustive form the
    tests pin semantics on.
    """
    spark = spark or conn.spark
    a = conn.tidy_view(var_name, version=v_old, spark=spark).withColumnRenamed(
        "value", "value_old"
    )
    b = conn.tidy_view(var_name, version=v_new, spark=spark).withColumnRenamed(
        "value", "value_new"
    )
    dims = [c for c in a.columns if c.startswith("dim")]
    joined = a.join(b, dims, "full_outer")
    vo, vn = F.col("value_old"), F.col("value_new")
    both_nan = F.isnan(vo) & F.isnan(vn)
    same = vo.eqNullSafe(vn) | (vo.isNotNull() & vn.isNotNull() & both_nan)
    return joined.filter(~same).select(
        *dims,
        "value_old",
        "value_new",
        F.when(vo.isNull(), F.lit("added"))
        .when(vn.isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )
