"""Continuously-maintained ANN index: streaming vector upkeep.

``operators/ann_index.py`` builds the IVF layout once from a static
corpus; a deployed similarity stack keeps the index current as new
embeddings arrive (fresh documents are embedded and must become
searchable without a full rebuild). IVF absorbs appends NATURALLY: the
coarse quantizer (centroids) is FIXED at train time, so a new vector's
cell assignment is a pure function of the persisted centroids — each
micro-batch appends exactly its own cell-partitioned rows, no corpus
rescan, no read-modify-write. (Production systems retrain centroids
offline on drift and swap the serving pointer — the same
rebuild-into-fresh-dir-and-swap discipline
``materialize_ann_index`` documents.)

Layout under ``index_dir``:

- ``codebook.json``      — written once by ``init_ann_index`` (the
  trained centroids; serving and every batch assignment read it).
- ``cells/batch-{id}/``  — one deterministically-named directory per
  micro-batch, each internally partitioned by ``cell``; replays
  overwrite their own directory (idempotent, the streaming/search.py
  discipline). Readers glob ``batch-*`` with a ``basePath`` so the
  ``cell=N`` partition column survives — and cell pruning still
  prunes, per batch directory.
- Compaction (``compact_ann_index``) folds batch dirs into one
  consolidated batch, same crash-convergence contract as
  ``streaming/search.compact_index``: a crash between the rename and
  the source removals leaves duplicates visible (serve with
  ``dedup=True`` until the rerun), and re-running converges because
  rows are content-unique per (id, cell).

Serving (``ivf_search``) reuses the probe computation and scoring of
the static path, so stream-maintained results equal a fit-inline
``similarity.ivf_topk`` over the union corpus — asserted by tests.
"""

from __future__ import annotations

import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators.ann_index import _probe_cells
from mandoline_hbase_spark.operators.similarity import (
    _as_double,
    _cell_scores,
    _centroids,
    cosine_rank_topk,
)


def init_ann_index(
    index_dir: str,
    dim: int,
    n_centroids: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    id_type: str = "bigint",
) -> dict:
    """Train (here: derive deterministically; a k-means fit drops in)
    and persist the coarse quantizer. Must run ONCE before the
    maintenance stream starts — every batch assignment and every query
    probe reads these centroids, which is what makes appends pure.
    ``id_type`` is recorded so empty-index reads carry the same schema
    as populated ones (string ids work end to end)."""
    cents = _centroids(dim, n_centroids, seed)
    meta = {
        "dim": int(dim),
        "n_centroids": int(n_centroids),
        "seed": int(seed),
        "id_col": id_col,
        "id_type": id_type,
        "centroids": [[float(x) for x in row] for row in cents],
        "pq_codebook": None,
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, ".codebook.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "codebook.json"))
    return meta


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "codebook.json")) as f:
        return json.load(f)


def _batch_dir(index_dir: str, batch_id: int) -> str:
    return os.path.join(index_dir, "cells", f"batch-{int(batch_id):010d}")


def append_ann_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    vec_col: str = "embedding",
) -> None:
    """The ``foreachBatch`` body: assign this batch's vectors to cells
    with the PERSISTED centroids and append them, partitioned by cell.
    Safe to replay (overwrite into the batch's own directory); cost ∝
    the batch, never the accumulated index."""
    import numpy as np

    meta = _load_meta(index_dir)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    id_col = meta["id_col"]
    assigned = (
        batch_df.select(F.col(id_col), _as_double(vec_col).alias("embedding"))
        .withColumn("cells", _cell_scores(F.col("embedding"), cents))
        .withColumn(
            "cell", (F.array_position("cells", F.array_max("cells")) - 1).cast("int")
        )
        .drop("cells")
    )
    (
        assigned.repartition(int(meta["n_centroids"]), F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(_batch_dir(index_dir, batch_id))
    )


def start_ann_maintenance(
    vec_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
):
    """Run the index-upkeep loop over a streaming embeddings frame;
    returns the StreamingQuery. ``init_ann_index`` must have run."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_ann_batch(batch_df, batch_id, index_dir, vec_col)

    return (
        vec_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cells(spark: SparkSession, index_dir: str, dedup: bool = False) -> DataFrame:
    """The accumulated (id, embedding, cell) table across batch dirs
    (empty frame when nothing is indexed). ``dedup=True`` serves
    correctly through the post-compaction-crash duplicate window (rows
    are value-identical across batches, so dropDuplicates is
    lossless)."""
    from functools import reduce

    meta = _load_meta(index_dir)
    root = os.path.join(index_dir, "cells")
    sources = (
        sorted(
            e.path
            for e in os.scandir(root)
            if e.is_dir() and e.name.startswith("batch-")
        )
        if os.path.isdir(root)
        else []
    )
    if not sources:
        return spark.createDataFrame(
            [],
            f"{meta['id_col']} {meta.get('id_type', 'bigint')}, "
            "embedding array<double>, cell int",
        )
    # one read per batch dir, each with ITS OWN basePath, so the cell=N
    # partition level inside every batch survives discovery (a single
    # glob read would try to parse the batch-NNN segment as a partition
    # and raise CONFLICTING_DIRECTORY_STRUCTURES) and cell predicates
    # still prune partitions within each batch
    parts = [
        spark.read.option("basePath", b).parquet(b) for b in sources
    ]
    df = reduce(lambda a, b: a.unionByName(b), parts)
    return df.dropDuplicates() if dedup else df


def compact_ann_index(
    spark: SparkSession,
    index_dir: str,
    target_rows: int = 1_000_000,
    owner: str | None = None,
    steal_stale_after_s: float | None = None,
) -> int:
    """Fold batch directories into one consolidated batch (small-files
    maintenance; same staging/crash-convergence protocol as
    streaming/search.compact_index — quiesce the stream while running,
    serve with ``dedup=True`` after a compaction crash until rerun).
    The single-compactor rule is ENFORCED by the ``.compaction.lease``
    conditional-put claim (``lease.maintenance_lease``): a second
    concurrent compactor raises :class:`LeaseHeldError` instead of
    removing batch dirs the winner never folded in; pass
    ``steal_stale_after_s`` to break a hard-crashed owner's lease.
    Returns the number of batch dirs afterwards."""
    from mandoline_hbase_spark.lease import maintenance_lease

    with maintenance_lease(
        index_dir, "compaction", owner=owner, steal_stale_after_s=steal_stale_after_s
    ):
        root = os.path.join(index_dir, "cells")
        if not os.path.isdir(root):
            return 0
        sources = sorted(
            e.path
            for e in os.scandir(root)
            if e.is_dir() and e.name.startswith("batch-")
        )
        if len(sources) <= 1:
            return len(sources)
        meta = _load_meta(index_dir)
        df = read_cells(spark, index_dir, dedup=True)
        n = df.count()
        gen = 1 + max(
            (
                int(os.path.basename(p).rsplit("-", 1)[1])
                for p in sources
                if "compacted" in os.path.basename(p)
            ),
            default=0,
        )
        new_dir = os.path.join(root, f"batch-compacted-{gen:03d}")
        tmp_dir = os.path.join(root, f".staging-compacted-{gen:03d}")
        for p in (new_dir, tmp_dir):
            if os.path.isdir(p):
                shutil.rmtree(p)
        # per-CELL file sizing: hash-repartitioning on `cell` alone can
        # never split one cell across tasks, so target_rows becomes an
        # intra-cell salt whose modulus is EACH CELL'S OWN row count over
        # the target (a skewed hot cell gets many files, cold cells one) —
        # a corpus-average modulus would violate the target exactly under
        # the drift skew cell_occupancy_report exists to detect
        id_col = meta["id_col"]
        per_cell = df.groupBy("cell").agg(
            F.greatest(
                F.lit(1), F.ceil(F.count(F.lit(1)) / F.lit(int(max(1, target_rows))))
            )
            .cast("int")
            .alias("_files")
        )
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.col("_files"))
        n_parts = max(int(meta["n_centroids"]), math.ceil(n / max(1, target_rows)))
        (
            df.join(F.broadcast(per_cell), "cell")
            .repartition(n_parts, F.col("cell"), salt)
            .drop("_files")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(tmp_dir)
        )
        os.replace(tmp_dir, new_dir)
        for p in sources:
            shutil.rmtree(p, ignore_errors=True)
        return 1


def cell_occupancy_report(spark: SparkSession, index_dir: str) -> DataFrame:
    """The RETRAIN signal for the fixed coarse quantizer: per-cell
    vector counts plus each cell's share of the corpus. Fixed centroids
    make appends pure, but corpus drift skews occupancy — a hot cell
    degrades probe selectivity toward a full scan (its partition holds
    an outsized corpus share), which is when production systems retrain
    offline and swap the serving pointer. ONE scan: the total derives
    from a window over the (n_centroids-row) cell-grain aggregate, so
    counts and shares come from the same snapshot — a batch landing
    between two separate jobs cannot skew the shares."""
    from pyspark.sql import Window

    # dedup=True: through the post-compaction-crash duplicate window a
    # plain read double-counts resurrected batches, which would fake a
    # hot-cell retrain signal
    counts = read_cells(spark, index_dir, dedup=True).groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    total = F.sum("n_vectors").over(Window.partitionBy())  # n_centroids rows
    return (
        counts.withColumn("share", F.round(F.col("n_vectors") / total, 6))
        .orderBy(F.col("n_vectors").desc(), F.col("cell").asc())
    )


def ivf_search(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    dedup: bool = False,
) -> DataFrame:
    """Serve an IVF query from the stream-maintained index — identical
    probe computation and scoring to the static served path, so results
    equal ``similarity.ivf_topk`` over the union corpus. The cell
    predicate prunes ``cell=N`` partitions inside every batch dir."""
    meta = _load_meta(index_dir)
    id_col = meta["id_col"]
    rows, probed, id_type = _probe_cells(
        queries_df, meta["centroids"], n_probe, id_col, vec_col
    )
    if not rows:
        raise ValueError("queries_df is empty")
    probes = spark.createDataFrame(
        rows, f"query_id {id_type}, qvec array<double>, cell int"
    )
    corpus = (
        read_cells(spark, index_dir, dedup=dedup)
        .filter(F.col("cell").isin(probed))
        .select(F.col(id_col).alias("neighbor_id"), F.col("embedding").alias("cvec"), "cell")
    )
    cands = corpus.join(F.broadcast(probes), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return cosine_rank_topk(cands, k)
