"""Streaming ANN index upkeep: stream-maintained cells == batch
assignment, served IVF == fit-inline over the union corpus, replay
idempotence, compaction convergence, and dedup-serving through the
crash window — the vector sibling of test_streaming_search.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import similarity
from mandoline_hbase_spark.streaming import ann as sann
from tests.conftest import SF_SMOKE

DDL = "vec_id bigint, embedding array<double>"


@pytest.fixture(scope="module")
def batches(spark):
    emb = (
        spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .orderBy("vec_id")
        .limit(90)
        .collect()
    )
    rows = [(r.vec_id, list(r.embedding)) for r in emb]
    return [rows[:30], rows[30:60], rows[60:90]]


def _run_stream(spark, tmp_path, batches) -> str:
    src = str(tmp_path / "incoming")
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=8, seed=7)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DDL).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/b{i}"
        )
    stream = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(src + "/b*")
    )
    q = sann.start_ann_maintenance(stream, index_dir, str(tmp_path / "ckpt"))
    assert q.awaitTermination(180), "maintenance stream did not finish in 180s"
    return index_dir


def _union_df(spark, batches):
    return spark.createDataFrame([r for b in batches for r in b], DDL)


def test_streamed_cells_equal_batch_assignment(spark, tmp_path, batches):
    index_dir = _run_stream(spark, tmp_path, batches)
    got = {
        (r.vec_id, r.cell)
        for r in sann.read_cells(spark, index_dir).select("vec_id", "cell").collect()
    }
    # batch form: assign the union corpus in one pass with the same centroids
    import numpy as np

    from mandoline_hbase_spark.operators.similarity import _cell_scores, _centroids

    cents = _centroids(64, 8, 7)
    want = {
        (r.vec_id, r.cell)
        for r in _union_df(spark, batches)
        .withColumn("cells", _cell_scores(F.col("embedding"), cents))
        .withColumn("cell", (F.array_position("cells", F.array_max("cells")) - 1).cast("int"))
        .select("vec_id", "cell")
        .collect()
    }
    assert got == want and len(got) == 90


def test_served_from_stream_equals_fit_inline(spark, tmp_path, batches):
    index_dir = _run_stream(spark, tmp_path, batches)
    union = _union_df(spark, batches)
    queries = union.filter(F.col("vec_id") < 5)
    want = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in similarity.ivf_topk(
            union, queries, dim=64, k=5, n_centroids=8, n_probe=3, seed=7
        ).collect()
    )
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in sann.ivf_search(spark, index_dir, queries, k=5, n_probe=3).collect()
    )
    assert got == want and got


def test_batch_replay_is_idempotent(spark, tmp_path, batches):
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=8, seed=7)
    b0 = spark.createDataFrame(batches[0], DDL)
    sann.append_ann_batch(b0, 0, index_dir)

    def snap():
        return {
            (r.vec_id, tuple(r.embedding), r.cell)
            for r in sann.read_cells(spark, index_dir).collect()
        }

    before = snap()
    sann.append_ann_batch(b0, 0, index_dir)  # foreachBatch crash replay
    after = snap()
    assert after == before and len(after) == 30


def test_compaction_preserves_results_and_heals_duplicates(spark, tmp_path, batches):
    index_dir = _run_stream(spark, tmp_path, batches)
    queries = _union_df(spark, batches).filter(F.col("vec_id") < 3)
    want = sorted(
        tuple(r) for r in sann.ivf_search(spark, index_dir, queries, k=5).collect()
    )
    assert sann.compact_ann_index(spark, index_dir) == 1
    root = os.path.join(index_dir, "cells")
    assert [e.name for e in os.scandir(root) if e.is_dir()] == ["batch-compacted-001"]
    after = sorted(
        tuple(r) for r in sann.ivf_search(spark, index_dir, queries, k=5).collect()
    )
    assert after == want
    # simulate the crash window: resurrect a folded batch -> duplicates
    sann.append_ann_batch(spark.createDataFrame(batches[0], DDL), 0, index_dir)
    dup = sorted(
        tuple(r) for r in sann.ivf_search(spark, index_dir, queries, k=5, dedup=True).collect()
    )
    assert dup == want  # dedup serving is correct through the window
    assert sann.compact_ann_index(spark, index_dir) == 1  # rerun converges
    healed = sorted(
        tuple(r) for r in sann.ivf_search(spark, index_dir, queries, k=5).collect()
    )
    assert healed == want


def test_empty_index_reads(spark, tmp_path):
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=8, seed=7)
    assert sann.read_cells(spark, index_dir).count() == 0


def test_streamed_ivf_scan_is_partition_pruned(spark, tmp_path, batches):
    """The cell predicate pushes through the per-batch union: every
    batch dir's scan carries PartitionFilters on cell, so probes read
    only probed partitions inside each batch — the scale property the
    cell layout exists for."""
    index_dir = _run_stream(spark, tmp_path, batches)
    queries = _union_df(spark, batches).filter(F.col("vec_id") < 2)
    out = sann.ivf_search(spark, index_dir, queries, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scans and all("cell" in ln and " IN " in ln for ln in scans), plan[:4000]


def test_post_retrain_served_plan_keeps_partition_pruning(spark, tmp_path, batches):
    """VERDICT r7 #7: the PartitionFilters guarantee must survive a
    generation swap — the retrain writes a FRESH root whose partition
    layout could silently differ from the one the pre-swap plan probe
    certified. After retrain (+ a post-swap append, so the new root
    holds multiple batch dirs like a live one), the served query must
    (a) read the NEW generation root and (b) still compile the cell
    predicate into PartitionFilters on every batch-dir scan. Also
    re-run after compaction: the compacted dir's layout must prune the
    same way."""
    index_dir = _run_stream(spark, tmp_path, batches)
    sann.retrain_ann_index(spark, index_dir, iters=2, n_centroids=8)
    late = [(9000 + i, list(v)) for i, (_, v) in enumerate(batches[0][:10])]
    sann.append_ann_batch(spark.createDataFrame(late, DDL), 77, index_dir)

    def probe():
        queries = _union_df(spark, batches).filter(F.col("vec_id") < 2)
        out = sann.ivf_search(spark, index_dir, queries, k=3, n_probe=2)
        files = out.inputFiles()
        assert files and all("cells-g001" in f for f in files), files
        plan = out._jdf.queryExecution().executedPlan().toString()
        scans = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert scans and all("cell" in ln and " IN " in ln for ln in scans), plan[:4000]
        return {(r.query_id, r.rank, r.neighbor_id) for r in out.collect()}

    before = probe()
    assert sann.compact_ann_index(spark, index_dir) >= 1
    assert probe() == before  # same answers, same pruned plan shape


def test_cell_occupancy_report(spark, tmp_path, batches):
    """The retrain signal: per-cell counts + corpus share, summing to
    the indexed total."""
    index_dir = _run_stream(spark, tmp_path, batches)
    rows = sann.cell_occupancy_report(spark, index_dir).collect()
    assert sum(r.n_vectors for r in rows) == 90
    assert all(0.0 < r.share <= 1.0 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # descending occupancy order, hottest first
    counts = [r.n_vectors for r in rows]
    assert counts == sorted(counts, reverse=True)


def _skew_rows(n, start_id=1000):
    # a drifted corpus: every vector points (almost) the same way, so
    # one cell of any fixed quantizer absorbs nearly all of them
    return [
        (start_id + i, [1.0, 0.5] + [0.001 * (i % 7)] * 62)
        for i in range(n)
    ]


def test_retrain_restores_occupancy_and_preserves_oracle(spark, tmp_path):
    """VERDICT r5 #3's done-criteria: a skew append trips the
    occupancy signal, retrain restores the bound, and full-probe ==
    brute-force still holds on the retrained index (the served path
    keeps its value-level oracle through the generation swap)."""
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=8, seed=7)
    rows = _skew_rows(60)
    sann.append_ann_batch(spark.createDataFrame(rows, DDL), 0, index_dir)

    top = sann.cell_occupancy_report(spark, index_dir).first()
    assert top.share > 0.5  # the drift signal trips

    report = sann.retrain_if_skewed(spark, index_dir, max_share=0.5, iters=5)
    assert report is not None and report["generation"] == 1
    assert report["n_vectors"] == 60
    assert report["max_share_after"] < report["max_share_before"]
    top_after = sann.cell_occupancy_report(spark, index_dir).first()
    assert top_after.share <= 0.5  # the bound is restored
    # ... and the loop is now quiet
    assert sann.retrain_if_skewed(spark, index_dir, max_share=0.5) is None

    # value-level oracle: probing every cell degrades exactly to brute
    # force, independent of what the retrained centroids are
    union = spark.createDataFrame(rows, DDL)
    queries = union.filter(F.col("vec_id") < 1003)
    want = sorted(
        tuple(r)
        for r in similarity.cosine_rank_topk(
            union.select(
                F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
            ).crossJoin(
                queries.select(
                    F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
                )
            ).filter(F.col("query_id") != F.col("neighbor_id")),
            5,
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in sann.ivf_search(spark, index_dir, queries, k=5, n_probe=8).collect()
    )
    assert got == want and got


def test_retrain_swap_appends_and_gc(spark, tmp_path):
    """Post-retrain life: new batches land in the new generation root
    (append_ann_batch re-reads the swapped codebook), pruned probes
    still serve correctly, the superseded root survives until
    gc_ann_generations, and gc removes exactly the stale roots."""
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=4, seed=7)
    sann.append_ann_batch(spark.createDataFrame(_skew_rows(40), DDL), 0, index_dir)
    sann.retrain_ann_index(spark, index_dir, iters=3)
    meta = sann._load_meta(index_dir)
    assert meta["cells_dir"] == "cells-g001" and meta["generation"] == 1
    # old root untouched (a racing reader may be serving from it)
    assert os.path.isdir(os.path.join(index_dir, "cells"))

    late = _skew_rows(10, start_id=5000)
    sann.append_ann_batch(spark.createDataFrame(late, DDL), 1, index_dir)
    assert os.path.isdir(
        os.path.join(index_dir, "cells-g001", "batch-0000000001")
    )  # landed in the NEW generation
    assert sann.read_cells(spark, index_dir).count() == 50

    # compaction operates on the current generation
    assert sann.compact_ann_index(spark, index_dir) == 1
    assert sann.read_cells(spark, index_dir).count() == 50

    # inside the enforced quiesce window gc is a NO-OP: a reader that
    # loaded the pre-swap codebook may still be scanning the old root
    assert sann.gc_ann_generations(index_dir) == []
    assert os.path.isdir(os.path.join(index_dir, "cells"))

    removed = sann.gc_ann_generations(index_dir, min_quiesce_s=0.0)
    assert removed == ["cells"]
    assert not os.path.isdir(os.path.join(index_dir, "cells"))
    assert sann.read_cells(spark, index_dir).count() == 50  # serving intact


def test_append_racing_a_retrain_self_heals_into_the_new_generation(
    spark, tmp_path, monkeypatch
):
    """ADVICE r6: an append that loaded the codebook BEFORE a retrain's
    pointer swap writes its batch into the superseded root — without
    the post-write re-check those rows would vanish at gc. The append
    must observe the moved pointer and re-land the batch in the
    current generation (idempotent re-write)."""
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=4, seed=7)
    sann.append_ann_batch(spark.createDataFrame(_skew_rows(40), DDL), 0, index_dir)
    stale_meta = sann._load_meta(index_dir)  # what a pre-swap reader holds
    sann.retrain_ann_index(spark, index_dir, iters=2)

    real_load, calls = sann._load_meta, {"n": 0}

    def load_pre_swap_once(d):
        calls["n"] += 1
        return stale_meta if calls["n"] == 1 else real_load(d)

    monkeypatch.setattr(sann, "_load_meta", load_pre_swap_once)
    late = _skew_rows(10, start_id=9000)
    sann.append_ann_batch(spark.createDataFrame(late, DDL), 1, index_dir)
    monkeypatch.undo()

    # the batch re-landed in the CURRENT generation (the straggler copy
    # in the old root is harmless — that root is superseded)
    assert os.path.isdir(os.path.join(index_dir, "cells-g001", "batch-0000000001"))
    assert sann.read_cells(spark, index_dir).count() == 50
    # and gc can now remove the old root: the straggler healed (same
    # batch name exists in the current generation)
    assert sann.gc_ann_generations(index_dir, min_quiesce_s=0.0) == ["cells"]
    assert sann.read_cells(spark, index_dir).count() == 50


def test_gc_straggler_check_survives_an_intervening_retrain(spark, tmp_path):
    """Code-review r7: a straggler stranded just after swap1 must still
    be detected after a SECOND retrain moves the latest swap time past
    its mtime — each superseded root is judged against the swap that
    superseded IT (codebook superseded_at_unix map), not the latest."""
    import time

    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=4, seed=7)
    sann.append_ann_batch(spark.createDataFrame(_skew_rows(20), DDL), 0, index_dir)
    sann.retrain_ann_index(spark, index_dir, iters=1)  # swap1: cells -> g001
    # straggler lands in the OLD root just after swap1
    straggler = os.path.join(index_dir, "cells", "batch-0000000042")
    os.makedirs(straggler)
    t_after_swap1 = time.time() + 0.5
    os.utime(straggler, (t_after_swap1, t_after_swap1))
    time.sleep(1.1)  # the second swap lands strictly after the straggler
    sann.retrain_ann_index(spark, index_dir, iters=1)  # swap2: g001 -> g002
    meta = sann._load_meta(index_dir)
    assert set(meta["superseded_at_unix"]) == {"cells", "cells-g001"}
    # latest swap time is PAST the straggler's mtime — with a
    # latest-swap-only check the straggler would look pre-swap and die
    assert meta["swapped_at_unix"] > t_after_swap1
    removed = sann.gc_ann_generations(index_dir, min_quiesce_s=0.0)
    assert "cells" not in removed and os.path.isdir(straggler)  # preserved
    assert removed == ["cells-g001"]  # the clean superseded root still goes


def test_gc_keeps_a_batch_landing_between_snapshot_and_swap(spark, tmp_path):
    """ADVICE r7 (medium): the straggler bound must be the retrain's
    corpus SNAPSHOT time, not its swap time. A batch appended after the
    snapshot but before the swap is missing from the new generation
    (the snapshot never saw it) even though its own pointer re-check —
    also pre-swap — observed a stable pointer and never re-landed.
    Judged against the swap time its mtime looks pre-swap and gc
    deletes its only copy; judged against the snapshot it is kept."""
    import time

    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=4, seed=7)
    sann.append_ann_batch(spark.createDataFrame(_skew_rows(20), DDL), 0, index_dir)
    sann.retrain_ann_index(spark, index_dir, iters=2)
    meta = sann._load_meta(index_dir)
    snap, swap = float(meta["superseded_at_unix"]["cells"]), float(meta["swapped_at_unix"])
    assert snap < swap  # the snapshot strictly precedes the commit point
    # a batch stranded in the snapshot->swap gap, absent from cells-g001
    straggler = os.path.join(index_dir, "cells", "batch-0000000042")
    os.makedirs(straggler)
    mid = (snap + swap) / 2.0
    os.utime(straggler, (mid, mid))

    assert sann.gc_ann_generations(index_dir, min_quiesce_s=0.0) == []
    assert os.path.isdir(straggler)  # only copy of those rows: preserved


def test_gc_refuses_a_root_with_unhealed_straggler_rows(spark, tmp_path):
    """A crash between an append's stranded write and its re-check
    leaves rows ONLY in the superseded root: gc must keep that root
    (deleting it is silent row loss) until the rows re-land or the
    operator forces."""
    import time

    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=4, seed=7)
    sann.append_ann_batch(spark.createDataFrame(_skew_rows(20), DDL), 0, index_dir)
    sann.retrain_ann_index(spark, index_dir, iters=2)
    # a post-swap batch stranded in the old root, absent from cells-g001
    straggler = os.path.join(index_dir, "cells", "batch-0000000042")
    os.makedirs(straggler)
    now = time.time() + 5  # strictly after the recorded swap
    os.utime(straggler, (now, now))

    assert sann.gc_ann_generations(index_dir, min_quiesce_s=0.0) == []
    assert os.path.isdir(straggler)  # rows preserved
    # the deliberate override discards it
    assert sann.gc_ann_generations(index_dir, min_quiesce_s=0.0, force=True) == ["cells"]
    assert not os.path.isdir(os.path.join(index_dir, "cells"))


def test_retrain_crash_before_pointer_swap_is_invisible_and_retry_converges(
    spark, tmp_path, monkeypatch
):
    """A crash after the generation rewrite but before the codebook
    swap must leave readers on the OLD generation (the pointer is the
    commit point), and the deterministic retry must overwrite the junk
    root and converge to the same post-state."""
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=4, seed=7)
    rows = _skew_rows(40)
    sann.append_ann_batch(spark.createDataFrame(rows, DDL), 0, index_dir)
    queries = spark.createDataFrame(rows[:2], DDL)
    served_before = sorted(
        tuple(r)
        for r in sann.ivf_search(spark, index_dir, queries, k=3, n_probe=4).collect()
    )

    real_replace = os.replace

    def crash_at_swap(src, dst):
        if dst.endswith("codebook.json"):
            raise OSError("simulated crash before the pointer swap")
        return real_replace(src, dst)

    monkeypatch.setattr(sann.os, "replace", crash_at_swap)
    with pytest.raises(OSError, match="simulated crash"):
        sann.retrain_ann_index(spark, index_dir, iters=3)
    monkeypatch.setattr(sann.os, "replace", real_replace)

    # the junk generation root exists, but the pointer never moved:
    # readers still serve the old generation, bit-identically
    assert os.path.isdir(os.path.join(index_dir, "cells-g001"))
    meta = sann._load_meta(index_dir)
    assert meta.get("cells_dir", "cells") == "cells"
    assert lease_free(index_dir)
    still_served = sorted(
        tuple(r)
        for r in sann.ivf_search(spark, index_dir, queries, k=3, n_probe=4).collect()
    )
    assert still_served == served_before

    # retry: same generation number, junk root overwritten, swap lands
    report = sann.retrain_ann_index(spark, index_dir, iters=3)
    assert report["generation"] == 1
    meta = sann._load_meta(index_dir)
    assert meta["cells_dir"] == "cells-g001"
    assert sann.read_cells(spark, index_dir).count() == 40
    # full probe == brute force still holds post-recovery
    got = sorted(
        tuple(r)
        for r in sann.ivf_search(spark, index_dir, queries, k=3, n_probe=4).collect()
    )
    union = spark.createDataFrame(rows, DDL)
    want = sorted(
        tuple(r)
        for r in similarity.cosine_rank_topk(
            union.select(
                F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
            ).crossJoin(
                queries.select(
                    F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
                )
            ).filter(F.col("query_id") != F.col("neighbor_id")),
            3,
        ).collect()
    )
    assert got == want


def lease_free(index_dir: str) -> bool:
    from mandoline_hbase_spark.lease import lease_holder

    return lease_holder(index_dir) is None


def test_retrain_blocked_by_held_lease(spark, tmp_path):
    from mandoline_hbase_spark.errors import LeaseHeldError
    from mandoline_hbase_spark.lease import maintenance_lease

    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=2, seed=7)
    sann.append_ann_batch(spark.createDataFrame(_skew_rows(10), DDL), 0, index_dir)
    with maintenance_lease(index_dir, owner="compactor"):
        with pytest.raises(LeaseHeldError):
            sann.retrain_ann_index(spark, index_dir)
    # nothing was swapped while blocked
    assert sann._load_meta(index_dir).get("cells_dir", "cells") == "cells"


def test_retrain_can_grow_centroids(spark, tmp_path):
    """Splitting: growing n_centroids seeds the extra slots from the
    hottest cells' means; the serving contract (full probe == brute
    force id set) holds at the new width."""
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=2, seed=7)
    sann.append_ann_batch(spark.createDataFrame(_skew_rows(30), DDL), 0, index_dir)
    report = sann.retrain_ann_index(spark, index_dir, n_centroids=6, iters=4)
    assert report["n_centroids"] == 6
    meta = sann._load_meta(index_dir)
    assert len(meta["centroids"]) == 6 and meta["n_centroids"] == 6
    queries = spark.createDataFrame(_skew_rows(2), DDL)
    out = sann.ivf_search(spark, index_dir, queries, k=3, n_probe=6)
    assert out.count() == 2 * 3


def test_compaction_sizes_files_within_cells(spark, tmp_path, batches):
    """target_rows translates into intra-cell file sizing: hash
    repartitioning on cell alone can never split a cell, so the
    compactor salts within cells — a small target must yield multiple
    files under at least one cell=N dir, and results are unchanged."""
    index_dir = _run_stream(spark, tmp_path, batches)
    queries = _union_df(spark, batches).filter(F.col("vec_id") < 3)
    want = sorted(tuple(r) for r in sann.ivf_search(spark, index_dir, queries, k=5).collect())
    assert sann.compact_ann_index(spark, index_dir, target_rows=5) == 1
    root = os.path.join(index_dir, "cells", "batch-compacted-001")
    multi = 0
    for cell_dir in (e.path for e in os.scandir(root) if e.is_dir()):
        files = [f for f in os.listdir(cell_dir) if f.endswith(".parquet")]
        assert files
        multi += len(files) > 1
    assert multi >= 1
    after = sorted(tuple(r) for r in sann.ivf_search(spark, index_dir, queries, k=5).collect())
    assert after == want


def test_retrain_growth_trigger_sqrt_sizing(spark, tmp_path):
    """VERDICT r8 #1: the mean-cell-row bound is an independent retrain
    trigger — a perfectly balanced index whose cells simply OUTGREW the
    bound refits at n_centroids ~ sqrt(N) (probe bytes become
    O(n_probe * sqrt(N)) instead of linear in the corpus), and the
    full-probe == brute-force serving contract survives the growth
    swap. Under the bound the loop stays quiet; a caller-pinned
    n_centroids overrides the sqrt rule."""
    emb = (
        spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .orderBy("vec_id")
        .limit(100)
    )
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    index_dir = str(tmp_path / "annidx")
    sann.init_ann_index(index_dir, dim=64, n_centroids=4, seed=7)
    sann.append_ann_batch(spark.createDataFrame(rows, DDL), 0, index_dir)

    # bound holds (100 <= 25 * 4 is false -> use a loose bound): quiet
    assert (
        sann.retrain_if_skewed(
            spark, index_dir, max_share=1.1, max_mean_cell_rows=100
        )
        is None
    )
    assert sann._load_meta(index_dir).get("cells_dir", "cells") == "cells"

    # bound trips (mean cell = 25 > 10): retrain at max(4, sqrt(100)) = 10
    report = sann.retrain_if_skewed(
        spark, index_dir, max_share=1.1, max_mean_cell_rows=10, iters=3
    )
    assert report is not None
    assert report["n_centroids"] == 10 and report["n_vectors"] == 100
    meta = sann._load_meta(index_dir)
    assert meta["n_centroids"] == 10 and meta["cells_dir"] == "cells-g001"

    # full probe at the new width == brute force (the oracle contract
    # the served catalog query relies on below the bound)
    union = spark.createDataFrame(rows, DDL)
    queries = union.filter(F.col("vec_id") < 3)
    want = sorted(
        tuple(r)
        for r in similarity.cosine_topk(union, queries, k=5).collect()
    )
    got = sorted(
        tuple(r)
        for r in sann.ivf_search(spark, index_dir, queries, k=5, n_probe=10).collect()
    )
    assert got == want and got

    # ... and the grown index now satisfies the same bound
    assert (
        sann.retrain_if_skewed(
            spark, index_dir, max_share=1.1, max_mean_cell_rows=10
        )
        is None
    )

    # caller-pinned n_centroids wins over the sqrt rule
    report2 = sann.retrain_if_skewed(
        spark,
        index_dir,
        max_share=1.1,
        max_mean_cell_rows=5,
        n_centroids=12,
        iters=2,
    )
    assert report2 is not None and report2["n_centroids"] == 12
