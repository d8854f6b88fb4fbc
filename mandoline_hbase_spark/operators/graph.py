"""Graph analytics over similarity graphs: degrees, triangles,
clustering coefficients.

Connected components (dedup.connected_components) answers "which docs
form one duplicate cluster"; these operators answer the finer structural
questions — how DENSE each neighborhood is (a high-clustering node sits
in a near-clique of mutual near-dups; a high-degree low-clustering node
is a hub stitching unrelated docs, the classic boilerplate signature).

Scale design: edges are canonical (``src < dst``) once; the triangle
join is the standard two-hop wedge join — every join keyed on a vertex,
no broadcast of the edge set, work ∝ Σ degree(v)² (wedge count), the
same bound every distributed triangle count has. For skewed degree
distributions, orient wedges from the lower-degree endpoint first to
cap the quadratic at the hub (documented; the doc-similarity graphs
here are near-clique shaped, not power-law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mandoline_hbase_spark.plans.audit import checkpoint_audited

from mandoline_hbase_spark.operators.dedup import segment_hashes


def shared_segment_edges(
    df: DataFrame,
    seg_len: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 512,
    hot_broadcast_max: int = 1_000_000,
) -> DataFrame:
    """Doc-similarity edges: pairs sharing at least ``min_shared``
    distinct segments, found by self-joining the (doc, segment-hash)
    table on the hash — the inverted-index pair generation every
    candidate-based dedup uses (bucket-bounded, never corpus²). Emits
    canonical ``(src, dst, shared)`` with ``src < dst``.

    Hot-key guard (same trade as ``dedup.banded_candidate_pairs``): a
    segment shared by k docs emits k² pairs, so one boilerplate segment
    ("all rights reserved…") shared by 100k docs would make a single
    join task quadratic. Segments with more than ``max_bucket_size``
    holders degrade to STAR pairing around the segment's min doc id —
    O(k) rows, hub connectivity preserved. For pairs through the hub
    the ``shared`` count stays exact (the hub-member pair is emitted
    for hot segments too); pairs between two non-hub members lose that
    segment's contribution, a bounded undercount that only triggers on
    degenerate corpora (the driver fixtures never exceed the cap, so
    the oracle-checked queries stay exact).

    Plan selection is adaptive like the dedup guard: one hash
    aggregation sizes the segments and the driver sees only the hot
    count. Zero hot segments — the common case — runs the plain
    inverted-index self-join with no guard machinery in the executed
    plan; few hot segments split with a broadcast anti-join; a
    pathologically hot corpus falls back to the fully distributed
    sizing window.
    """
    # eager localCheckpoint: the (doc, segment) table feeds BOTH the
    # sizing job and the pair join — without it the md5 segment pipeline
    # recomputes per consumer. A persist() would need a caller-side
    # unpersist (the returned plan is lazy), leaking a MEMORY_AND_DISK
    # entry per call for the session's lifetime; the checkpoint's blocks
    # are freed by the context cleaner once the plan is unreachable.
    # Size is the same (id, hash) volume the sizing window would have
    # shuffled. Known trade: localCheckpoint truncates lineage, so on a
    # real cluster an executor loss makes the downstream job fail
    # (non-recomputable blocks) where a persisted plan would recover;
    # long multi-hour jobs on flaky fleets should prefer RELIABLE
    # checkpointing (sparkContext.setCheckpointDir + .checkpoint()) or
    # persist with a caller-managed unpersist. Local mode and the
    # bounded jobs here never see that failure mode, and the eager job
    # this line triggers is the same sizing scan the guard needs anyway.
    segs = checkpoint_audited(
        segment_hashes(df, seg_len, id_col, text_col)
        .select(F.col(id_col).alias("_id"), "seg_md5")
        .dropDuplicates(["_id", "seg_md5"])
    )
    sizes = segs.groupBy("seg_md5").agg(
        F.count(F.lit(1)).alias("_bsz"), F.min("_id").alias("_hub")
    )
    hot = sizes.filter(F.col("_bsz") > max_bucket_size)
    n_hot = hot.limit(hot_broadcast_max + 1).count()

    def _pairs(src: DataFrame) -> DataFrame:
        a = src.select(F.col("_id").alias("src"), "seg_md5")
        b = src.select(F.col("_id").alias("dst"), "seg_md5")
        return a.join(b, "seg_md5").filter(F.col("src") < F.col("dst")).select("src", "dst")

    if n_hot == 0:
        pair_rows = _pairs(segs)
    elif n_hot <= hot_broadcast_max:
        cold = segs.join(F.broadcast(hot.select("seg_md5")), "seg_md5", "left_anti")
        star = (
            segs.join(F.broadcast(hot), "seg_md5")
            .filter(F.col("_id") != F.col("_hub"))
            .select(F.col("_hub").alias("src"), F.col("_id").alias("dst"))
        )
        pair_rows = _pairs(cold).union(star)
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("seg_md5")
        sized = segs.withColumn("_bsz", F.count(F.lit(1)).over(w)).withColumn(
            "_hub", F.min("_id").over(w)
        )
        small = sized.filter(F.col("_bsz") <= max_bucket_size).select("_id", "seg_md5")
        star = (
            sized.filter((F.col("_bsz") > max_bucket_size) & (F.col("_id") != F.col("_hub")))
            .select(F.col("_hub").alias("src"), F.col("_id").alias("dst"))
        )
        pair_rows = _pairs(small).union(star)
    return (
        pair_rows.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node degree of an undirected canonical edge list."""
    return (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via the wedge join: for canonical edges
    (x<y), wedge (x,y)+(y,z) closes iff (x,z) is an edge; each found
    triangle credits all three vertices.
    """
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
    e1 = e
    e2 = e.select(F.col("x").alias("y"), F.col("y").alias("z"))
    e3 = e.select(F.col("x").alias("x"), F.col("y").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"])
    return (
        tris.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def node_metrics(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node (degree, triangle count, local clustering coefficient
    ``2T / (d(d-1))``, 0 for degree-1 nodes) over a canonical edge list.
    """
    d = degrees(edges, src, dst)
    t = triangles(edges, src, dst)
    joined = d.join(t, "node", "left")
    tri = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
    deg = F.col("degree")
    coeff = F.when(deg < 2, F.lit(0.0)).otherwise(
        F.round(tri * 2 / (deg * (deg - 1)), 4)
    )
    return joined.select(
        "node", deg.alias("degree"), tri.alias("n_triangles"), coeff.alias("clustering")
    )


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    id_col: str = "doc_id",
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected canonical edge list,
    computed in integer NANO-UNITS with floor division throughout.

    Why fixed-point: float PageRank sums neighbor contributions in
    whatever order the shuffle delivers them, so two engines disagree in
    the last ulp and an exact oracle compare becomes flaky. With ranks
    as BIGINT nano-units, contributions ``rank // degree`` and the
    damping ``(85 * s) // 100`` are integer-exact on every engine — the
    oracle matches bit-for-bit. The quantization error (≤ degree nano
    per node per round) is ~1e-9 of the rank mass, far below any use of
    the scores.

    Scale shape: per iteration one join keyed on the source vertex and
    one aggregation keyed on the destination — identical to the
    connected-components round; rank state is one long per vertex.
    Dangling mass is not redistributed (the isolated-node rank stays at
    the teleport floor), the standard simplification, mirrored by the
    oracle.

    Lineage is truncated with an eager localCheckpoint only every
    ``checkpoint_every`` iterations: the materialization costs more
    than Catalyst's analysis of a few stacked join rounds (measured
    4.6 s -> 1.7 s at 3 iterations on the sf0.1 fixture), while
    unbounded stacking would blow up analysis on long runs — the same
    cadence trade as iterative MLlib algorithms.
    """
    total = nodes.count()
    if total == 0:
        return nodes.select(F.col(id_col).alias("node"), F.lit(0.0).alias("rank"))
    tele = (100 - damping_pct) * 1_000_000_000 // (100 * total)
    init = 1_000_000_000 // total
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # eager checkpoint, not persist: every iteration joins this table, and
    # with the lazy iteration loop (checkpoint cadence) the whole plan
    # executes after this function returns — a persist/unpersist pair
    # around the loop would already be released, recomputing the
    # degree join once per iteration
    sym_deg = checkpoint_audited(sym.join(deg, "u"))
    ranks = nodes.select(
        F.col(id_col).alias("node"), F.lit(init).cast("bigint").alias("r")
    )
    for it in range(iters):
        contribs = (
            sym_deg.join(ranks, sym_deg.u == ranks.node)
            .select(F.col("v").alias("node"), F.expr("r div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("node"))
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(tele).cast("bigint")
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).alias("r"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = checkpoint_audited(ranks)
    return ranks.select(
        "node", F.col("r").alias("rank_nano"), F.round(F.col("r") / 1e9, 9).alias("rank")
    )
