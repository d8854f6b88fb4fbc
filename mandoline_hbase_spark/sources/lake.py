"""Lake layout helpers: partitioned and bucketed parquet tables.

At 100 TB the physical layout IS the query plan:

- **Partition columns** (directory-level) give partition PRUNING — a
  filter on the partition column skips whole directories before any IO.
  Partition by coarse, low-cardinality attributes (date, region).
- **Bucketing** (file-level hash layout, via ``saveAsTable``) gives
  SHUFFLE-FREE joins and aggregations on the bucket key: two tables
  bucketed identically join without an Exchange on either side.

This module mirrors the decision the survey records for the storage
layer (SURVEY §4: chunk_index partitioned/z-ordered by (var_name,
coord) keeps the latest-<=-version scan pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet partitioned by directory columns (pruning layout)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table (bucket metadata needs the catalog;
    plain .parquet() paths cannot carry it)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table_name)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton (Z-order) key interleaving the low ``bits`` of two
    non-negative integer columns.

    Sorting a table by this key clusters rows so that BOTH dimensions
    are locally coherent inside every parquet row group: min/max stats
    then prune row groups for a predicate on either column (or a box on
    both), where a plain lexicographic sort only prunes on its leading
    column. This is the layout SURVEY §4 prescribes for the chunk index
    at scale — z-order by (var hash, linearized coord) keeps the
    latest-<=-version scan pruned over billions of index rows.

    Pure column arithmetic (shifts + masks), whole-stage codegen; no
    shuffle beyond the final range sort.
    """
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i)
        )
    return key


def quantized_zorder_key(df: DataFrame, col_a: str, col_b: str, bits: int = 16):
    """Morton key of two columns QUANTIZED onto a common ``bits``-wide
    grid (min/max-scaled) — the form every z-order writer should use.

    Interleaving RAW values whose domains differ in bit width (a 17-bit
    id against an 11-bit id) hands every significant key bit to the
    wider column: the layout silently degenerates to a lexicographic
    sort on it and the narrow column never prunes (found by the r8
    zorder benchmark). Quantization affects ordering only, never output
    rows. Runs ONE driver-side bounds aggregate over ``df`` (the
    columns' min/max become literals in the returned expression).

    Returns ``(key_column, n_rows)``; the key is ``None`` when the
    frame is empty or either column is entirely NULL — callers fall
    back to writing unkeyed (there is nothing to cluster). The row
    count rides in the SAME aggregate so clustering rewrites that need
    a chunk count (``layout.zorder_cluster_records``) pay one pre-scan,
    not two.
    """
    from pyspark.sql import functions as F

    if not 1 <= int(bits) <= 31:
        # the key writes bit 2*bits-1; bit 63 is the long sign bit, and
        # quantized values ALWAYS reach the top of the grid, so
        # bits >= 32 would flip signs and break the curve at zero
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    b = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(col_a).alias("a0"), F.max(col_a).alias("a1"),
        F.min(col_b).alias("b0"), F.max(col_b).alias("b1"),
    ).first()
    n = int(b["n"])
    if b["a0"] is None or b["b0"] is None:
        return None, n
    grid = float((1 << bits) - 1)

    def _q(col, lo, hi):
        # floor/ceil (NOT int(), which truncates toward zero): a float
        # column with lo=-3.7 would otherwise offset by -3 and quantize
        # sub-minimum rows NEGATIVE (arithmetic shiftright fills ones —
        # a scrambled key); hi=2.4 truncated to 2 would push the max row
        # PAST the grid and wrap modulo 2^bits. Clamp for belt and
        # braces — quantization is ordering-only, a clamped edge row
        # just shares the boundary cell.
        import math as _math

        lo_f = float(_math.floor(float(lo)))
        span = float(max(1.0, _math.ceil(float(hi)) - lo_f))
        q = F.floor((col.cast("double") - F.lit(lo_f)) * grid / span)
        return F.least(F.greatest(q, F.lit(0.0)), F.lit(grid)).cast("long")

    key = zorder_key(
        _q(F.col(col_a), b["a0"], b["a1"]),
        _q(F.col(col_b), b["b0"], b["b1"]),
        bits,
    )
    return key, n


def zorder_key_n(cols, bits: int = 16):
    """Morton key interleaving the low ``bits`` of N non-negative
    integer columns round-robin (column 0 owns the most significant
    bit of each round) — :func:`zorder_key` generalized beyond two
    dimensions, for chunk layouts clustered on three or more filter
    columns (e.g. var hash x time bucket x tenant).

    Total key width is ``len(cols) * bits`` and must fit a signed
    64-bit long (<= 63); the same shift/mask whole-stage-codegen
    arithmetic, no shuffle.
    """
    from pyspark.sql import functions as F

    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key_n needs at least one column")
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits = {n * bits} key bits; max 63")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    row_group_rows: int = 4096,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-sorted by the QUANTIZED Morton key of
    (col_a, col_b) — :func:`quantized_zorder_key`, so mismatched domain
    widths cannot silently degenerate the layout to a lexicographic
    sort (r8 finding). An empty frame / all-NULL key column writes
    unsorted.

    ``orderBy`` is a range shuffle (one exchange — the one-time
    clustering cost); small row groups make the min/max stats fine-
    grained enough that point/box predicates on either column skip most
    groups at read time.
    """
    key, _ = quantized_zorder_key(df, col_a, col_b, bits)
    out = df if key is None else (
        df.withColumn("_zkey", key).orderBy("_zkey").drop("_zkey")
    )
    (
        out.write.mode(mode)
        .option("parquet.block.size", 1024 * 1024)
        .option("spark.sql.files.maxRecordsPerFile", 10_000_000)
        .option("parquet.page.row.count.limit", row_group_rows)
        .parquet(path)
    )
