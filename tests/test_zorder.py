"""Z-order clustering quality: row-group pruning on BOTH dimensions.

SURVEY §4 prescribes z-ordering the chunk index by (var, coord) so the
latest-<=-version scan stays pruned at billions of rows. This test pins
the property that makes that work: after sorting by the Morton key,
parquet row-group min/max stats prune a predicate on EITHER dimension,
whereas a lexicographic sort only prunes its leading column.

The row-group layout is materialized with a fixed group size so the
pruning counts are deterministic; Spark computes the orderings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _candidate_groups(path: str, col: str, lo: int, hi: int) -> int:
    """Row groups whose [min,max] stats overlap [lo, hi] — the groups a
    reader must actually fetch for this predicate."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().names.index(col)
    n = 0
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        if st.min <= hi and st.max >= lo:
            n += 1
    return n


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.sources.lake import zorder_key

    side = 128  # 16384 rows over a 128x128 (var, coord) grid
    df = (
        spark.range(side * side)
        .select(
            (F.col("id") % side).alias("var_hash"),
            (F.col("id") / side).cast("long").alias("coord_lin"),
        )
    )
    zsorted = (
        df.withColumn("_z", zorder_key(F.col("var_hash"), F.col("coord_lin"), bits=8))
        .orderBy("_z")
        .drop("_z")
        .toPandas()
    )
    lexsorted = df.orderBy("var_hash", "coord_lin").toPandas()

    zpath, lpath = str(tmp_path / "z.parquet"), str(tmp_path / "lex.parquet")
    pq.write_table(pa.Table.from_pandas(zsorted, preserve_index=False), zpath, row_group_size=512)
    pq.write_table(pa.Table.from_pandas(lexsorted, preserve_index=False), lpath, row_group_size=512)
    total = pq.ParquetFile(zpath).metadata.num_row_groups
    assert total == side * side // 512

    # Leading-column predicate: both layouts prune well.
    assert _candidate_groups(zpath, "var_hash", 0, 7) <= total // 4
    assert _candidate_groups(lpath, "var_hash", 0, 7) <= total // 4

    # Trailing-column predicate: lexicographic cannot prune AT ALL
    # (every group spans the full coord range); z-order still prunes.
    z_coord = _candidate_groups(zpath, "coord_lin", 0, 7)
    lex_coord = _candidate_groups(lpath, "coord_lin", 0, 7)
    assert lex_coord == total
    assert z_coord <= total // 4, (z_coord, total)

    # The scan from SURVEY §3.3 — a (var, coord) box — fetches a small
    # fraction of groups under z-order.
    zbox = sum(
        1
        for g in range(total)
        if _overlaps(zpath, g, "var_hash", 0, 7) and _overlaps(zpath, g, "coord_lin", 0, 7)
    )
    assert zbox <= total // 8, (zbox, total)


def _overlaps(path: str, group: int, col: str, lo: int, hi: int) -> bool:
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().names.index(col)
    st = md.row_group(group).column(idx).statistics
    return st.min <= hi and st.max >= lo


def test_zorder_key_is_bijective_and_box_monotone(spark):
    """Property: the Morton key is a bijection on the bit-bounded grid
    (no two cells collide), so sorting by it is a total ordering of the
    grid — required for the pruning guarantees above."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.sources.lake import zorder_key

    side = 64
    df = spark.range(side * side).select(
        (F.col("id") % side).alias("a"), (F.col("id") / side).cast("long").alias("b")
    )
    keys = df.select(zorder_key(F.col("a"), F.col("b"), bits=6).alias("z"))
    assert keys.distinct().count() == side * side
    lo, hi = keys.agg(F.min("z"), F.max("z")).first()
    assert lo == 0 and hi == side * side - 1


def test_zorder_key_n_matches_two_col_form(spark):
    """zorder_key_n over [a, b] must equal the 2-col zorder_key bit for
    bit (a owns the higher bit of each round in both)."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.sources.lake import zorder_key, zorder_key_n

    df = spark.range(0, 64).select(
        (F.col("id") % 8).alias("a"), (F.col("id") / 8).cast("long").alias("b")
    )
    rows = df.select(
        zorder_key(F.col("a"), F.col("b"), bits=3).alias("z2"),
        zorder_key_n([F.col("a"), F.col("b")], bits=3).alias("zn"),
    ).collect()
    assert all(r["z2"] == r["zn"] for r in rows)


def test_zorder_key_n_three_cols_bijective(spark):
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.sources.lake import zorder_key_n

    df = spark.range(0, 512).select(
        (F.col("id") % 8).alias("a"),
        ((F.col("id") / 8) % 8).cast("long").alias("b"),
        (F.col("id") / 64).cast("long").alias("c"),
    )
    keys = [
        r["z"]
        for r in df.select(
            zorder_key_n([F.col("a"), F.col("b"), F.col("c")], bits=3).alias("z")
        ).collect()
    ]
    assert len(set(keys)) == 512  # bijective over the 8x8x8 cube
    assert min(keys) == 0 and max(keys) == 511


def test_zorder_key_n_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.sources.lake import zorder_key_n

    with _pytest.raises(ValueError):
        zorder_key_n([], bits=8)
    with _pytest.raises(ValueError):
        zorder_key_n([F.col("a"), F.col("b")], bits=32)  # 64 key bits > 63
