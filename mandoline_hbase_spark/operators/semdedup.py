"""SemDeDup-style semantic deduplication over embedding columns.

Cluster-bounded near-duplicate pruning (the SemDeDup recipe: cluster the
embedding space, compare pairs only *within* a cluster, keep one
representative per near-duplicate pair): the O(n^2) pair join becomes
sum_c O(|c|^2), and the expensive step — centroid assignment — is a
map-only pass against broadcast centroid literals with ZERO shuffles.
The only shuffle in the whole pipeline is the intra-cluster self-join,
keyed on ``cluster_id``.

Centroid choice here is deterministic (the ``k`` lowest-id vectors), so
every stage is oracle-checkable against ANSI SQL. At 100 TB the same
operators take k-means centroids fit offline (or a few Lloyd passes);
the plan shapes are identical, and cluster-size skew is controlled by
raising ``k`` (more, smaller clusters) exactly as in the paper.

The reference backend has no similarity surface (SURVEY.md §2.2); this
is a north-star LLM-pipeline extension over the ``embeddings`` fixture.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(x, y):
    """Left-fold dot product — sequential summation, parity with SQL engines."""
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v)


# NOTE: unrolling the dot into element_at sums was tried and is a trap —
# 64-term expression trees per candidate blow the generated code past
# Janino limits (multi-MB task binaries, 7x slower than the fold).


def deterministic_centroids(
    emb: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """The ``k`` lowest-id vectors as (id, vector) centroid pairs.

    Driver-side collect of k rows (k is tiny, e.g. 8-65536); swap in
    k-means centroids at scale without touching the operators below.
    """
    rows = emb.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    return [(int(r[0]), [float(v) for v in r[1]]) for r in rows]


def assign_clusters(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment as a pure map.

    Centroids are inlined as literal arrays — the broadcast is the plan
    itself, so assignment is embarrassingly parallel: no join, no
    shuffle, whole-stage codegen end to end. Ties break to the smallest
    centroid id. Adds ``cluster_id`` and ``centroid_sim``.

    NOTE (r11 session 3, measured dead ends — do not retry without new
    evidence): (a) spreading ``emb`` to session parallelism before the
    map made every semantic query SLOWER at sf1h (assign +17%, kmeans
    +3%, blas +4% — the exchange costs more than the fold gains,
    because the wall is driver planning/codegen of the k x dim literal
    plan, not executor fold time); (b) shipping centroids as broadcast
    DATA instead of literals (value-independent generated code,
    bit-identical output) measured neutral for the same reason —
    per-iteration Catalyst analysis dominates, not Janino compiles.
    """
    with_norm = emb.withColumn("_ad", F.col(vec_col).cast("array<double>")).withColumn(
        "_vnorm", F.sqrt(_dot(F.col("_ad"), F.col("_ad")))
    )
    candidates = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(v)) for v in cvec])
        cnorm = math.sqrt(math.fsum(float(v) * float(v) for v in cvec))
        sim = _dot(F.col("_ad"), c) / (F.col("_vnorm") * F.lit(cnorm))
        # struct ordering: max sim first, then smallest centroid id.
        candidates.append(F.struct(sim.alias("s"), F.lit(-cid).cast("long").alias("nid")))
    best = F.array_max(F.array(*candidates))
    return (
        with_norm.withColumn("cluster_id", (-best["nid"]).cast("bigint"))
        .withColumn("centroid_sim", best["s"])
        .drop("_vnorm", "_ad")
    )


def semantic_near_dup_pairs(
    emb: DataFrame,
    k: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster near-duplicate pairs: cosine >= threshold, id_a < id_b.

    One shuffle: the self-join on ``cluster_id``. Pair work is bounded by
    the largest cluster, not the corpus — tune ``k`` so clusters fit the
    executor (SemDeDup uses ~100k clusters at web scale).

    The pair dot product stays a JVM left-fold for bit parity with SQL
    oracles; when parity is not required, use
    :func:`semantic_near_dup_pairs_matmul` — the per-cluster BLAS gram
    matrix is 3.7x faster at sf0.1 (0.83 s vs 3.11 s, identical pair
    set) and the honest GPU/matmul path at web scale.
    """
    centroids = deterministic_centroids(emb, k, id_col, vec_col)
    return _pairs_from_assigned(
        assign_clusters(emb, centroids, id_col, vec_col), threshold, id_col, vec_col
    )


def _pairs_from_assigned(
    assigned_in: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    av = F.col(vec_col).cast("array<double>")
    # Normalize ONCE per row (n norm computations, not n^2): the pair
    # predicate then costs a single dot product. The norm lands in its
    # own column first so the transform lambda doesn't re-inline the
    # norm expression per element.
    assigned = (
        assigned_in
        .withColumn("_ad", av)
        .withColumn("_n", F.sqrt(_dot(F.col("_ad"), F.col("_ad"))))
        .select(
            F.col("cluster_id"),
            F.col(id_col),
            F.transform("_ad", lambda x: x / F.col("_n")).alias("_nv"),
        )
    )
    # Slice side A so pair work inside one cluster spreads over n_slices
    # tasks instead of serializing per cluster key — the local analog of
    # the salting needed when cluster count < core count (at web scale
    # k is large and slicing becomes unnecessary).
    n_slices = max(assigned.sparkSession.sparkContext.defaultParallelism, 8)
    a = assigned.select(
        "cluster_id",
        F.col(id_col).alias("id_a"),
        F.col("_nv").alias("_na"),
        (F.col(id_col) % n_slices).alias("_slice"),
    )
    b = assigned.select(
        "cluster_id",
        F.col(id_col).alias("id_b"),
        F.col("_nv").alias("_nb"),
        F.explode(F.sequence(F.lit(0), F.lit(n_slices - 1))).alias("_slice"),
    )
    return (
        a.join(b, ["cluster_id", "_slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", _dot(F.col("_na"), F.col("_nb")))
        .filter(F.col("sim") >= float(threshold))
        .select("cluster_id", "id_a", "id_b", "sim")
    )


def semantic_near_dup_pairs_matmul(
    emb: DataFrame,
    k: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The matmul scale path for within-cluster pairs.

    Same candidate structure as :func:`semantic_near_dup_pairs` (one
    shuffle, keyed on ``cluster_id``), but each cluster's similarities
    come from ONE BLAS gram matrix (``Xn @ Xn.T``) inside a grouped
    ``applyInPandas`` instead of n² per-pair JVM folds — the execution
    strategy SemDeDup assumes at web scale, where a cluster fits one
    executor and the O(|c|²·d) work runs vectorized (or on GPU).

    The JVM-fold variant stays the oracle-parity baseline: float64
    matmul and sequential fold can disagree in the last ulp, so this
    path is verified by equivalence-within-tolerance tests rather than
    the hash-matching SQL oracle.
    """
    centroids = deterministic_centroids(emb, k, id_col, vec_col)
    assigned = assign_clusters(emb, centroids, id_col, vec_col)
    return _pairs_from_assigned_matmul(assigned, threshold, id_col, vec_col)


def _pairs_from_assigned_matmul(
    assigned_in: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    assigned = assigned_in.select("cluster_id", id_col, vec_col)
    thr, idc, vc = float(threshold), id_col, vec_col
    # id columns keep the input's id type (string ids work like the fold
    # variant's) — the output schema is derived, not hardcoded
    id_type = dict(assigned.dtypes)[id_col]

    def cluster_pairs(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series([], dtype="int64"),
                    "id_a": pdf[idc].iloc[0:0],
                    "id_b": pdf[idc].iloc[0:0],
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        order = pdf[idc].to_numpy().argsort()
        ids = pdf[idc].to_numpy()[order]
        X = np.stack(pdf[vc].to_numpy()[order]).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ Xn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = S[iu, ju] >= thr
        return pd.DataFrame(
            {
                "cluster_id": np.full(int(keep.sum()), int(pdf["cluster_id"].iloc[0])),
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "sim": S[iu, ju][keep],
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(
        cluster_pairs, f"cluster_id bigint, id_a {id_type}, id_b {id_type}, sim double"
    )


def semantic_near_dup_pairs_matmul_micro(
    emb: DataFrame,
    k: int = 8,
    threshold_num: int = 2,
    threshold_den: int = 5,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The BLAS pair stage made HASH-EXACT (VERDICT r7 #2): quantize
    each embedding element to integer micro-units (``floor(x·scale)``,
    integer-valued float64), so the per-cluster gram matrix ``Q @ Q.T``
    is EXACT no matter what order BLAS sums in — every partial sum of an
    integer-valued dot stays below 2^53 (asserted per batch), where
    float64 arithmetic is exact and order-independent. The threshold
    test ``cos ≥ num/den`` becomes the pure-integer predicate
    ``dot ≥ 0 AND den²·dot² ≥ num²·‖a‖²·‖b‖²`` (arbitrary-precision
    ints at the boundary; a float prescreen with a 1e-12 relative
    margin adjudicates the bulk), which DuckDB reproduces verbatim over
    HUGEINTs — summation order stops mattering, so the scale path
    carries a full value-level oracle instead of a no-oracle rationale.

    Output: ``(cluster_id, id_a, id_b, dot_micro)`` with ``dot_micro``
    the exact integer quantized dot product (fits int64: ≤ dim·scale²
    per the same 2^53 precondition).
    """
    if threshold_num < 0 or threshold_den <= 0:
        raise ValueError("threshold must be a non-negative rational num/den")
    centroids = deterministic_centroids(emb, k, id_col, vec_col)
    assigned = assign_clusters(emb, centroids, id_col, vec_col).select(
        "cluster_id", id_col, vec_col
    )
    tn, td, sc, idc, vc = int(threshold_num), int(threshold_den), int(scale), id_col, vec_col
    id_type = dict(assigned.dtypes)[id_col]

    def cluster_pairs(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series([], dtype="int64"),
                    "id_a": pdf[idc].iloc[0:0],
                    "id_b": pdf[idc].iloc[0:0],
                    "dot_micro": pd.Series([], dtype="int64"),
                }
            )
        order = pdf[idc].to_numpy().argsort()
        ids = pdf[idc].to_numpy()[order]
        X = np.stack(pdf[vc].to_numpy()[order]).astype(np.float64)
        Q = np.floor(X * sc)  # integer-valued float64, exact for |x|·sc < 2^53
        dim = Q.shape[1]
        maxq = float(np.abs(Q).max()) if Q.size else 0.0
        if dim * maxq * maxq >= 2.0**53:
            raise ValueError(
                f"micro-unit exactness violated: dim({dim})·maxq²({maxq}²) "
                "reaches 2^53 — lower `scale` so the gram matrix stays exact"
            )
        G = Q @ Q.T  # dgemm over integer-valued float64: EXACT (see above)
        n = np.diag(G)
        iu, ju = np.triu_indices(len(ids), k=1)
        d = G[iu, ju]
        lhs = float(td * td) * d * d  # may round: ~1e28 >> 2^53
        rhs = float(tn * tn) * n[iu] * n[ju]
        keep = (d >= 0) & (lhs > rhs * (1.0 + 1e-12))
        boundary = ~keep & (d >= 0) & (lhs >= rhs * (1.0 - 1e-12))
        for bi in np.nonzero(boundary)[0]:
            di, nai, nbi = int(d[bi]), int(n[iu[bi]]), int(n[ju[bi]])
            keep[bi] = td * td * di * di >= tn * tn * nai * nbi  # exact ints
        return pd.DataFrame(
            {
                "cluster_id": np.full(int(keep.sum()), int(pdf["cluster_id"].iloc[0])),
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "dot_micro": d[keep].astype(np.int64),
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(
        cluster_pairs,
        f"cluster_id bigint, id_a {id_type}, id_b {id_type}, dot_micro bigint",
    )


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_strategy: str = "fold",
) -> DataFrame:
    """Per-vector keep/drop: drop the larger id of every near-dup pair.

    Output: ``(vec_id, cluster_id, is_kept)`` for the whole corpus. The
    keep rule (smallest id survives its duplicate set) is deterministic
    across re-runs and partitionings — required for incremental corpus
    rebuilds.

    ``pair_strategy``: ``"fold"`` computes pair similarities as JVM
    left-folds (bit-parity with sequential-sum SQL engines); ``"matmul"``
    runs the per-cluster BLAS gram matrix (3.7x faster, the web-scale
    path). Both yield the same pair set unless a similarity sits within
    one float64 ulp of ``threshold`` (pinned by the fold/matmul
    equivalence test).

    Caching contract: the assignment DataFrame is persisted (it feeds
    both the pair join and the output) and stays cached until the caller
    clears it — call ``spark.catalog.clearCache()`` (bench.py does,
    between queries) or unpersist after materializing the result when
    invoking repeatedly in one session.
    """
    if pair_strategy not in ("fold", "matmul"):
        raise ValueError(f"unknown pair_strategy: {pair_strategy!r}")
    centroids = deterministic_centroids(emb, k, id_col, vec_col)
    # One assignment pass feeds both the output and the pair join;
    # persist it so the map-only assignment (k cosine folds per row plus
    # the scan) runs once, not once per consumer. Tiny: id + vector +
    # two columns per row.
    assigned = assign_clusters(emb, centroids, id_col, vec_col).persist()
    pair_fn = (
        _pairs_from_assigned if pair_strategy == "fold" else _pairs_from_assigned_matmul
    )
    dropped = (
        pair_fn(assigned, threshold, id_col, vec_col)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("_drop").isNull().alias("is_kept"),
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd's k-means over an embedding column.

    Each iteration is one map-only assignment (broadcast literal
    centroids, same plan as :func:`assign_clusters`) plus one groupBy
    shuffle that reduces to k rows of per-dimension means — the driver
    only ever holds k x dim floats. Initialization is the deterministic
    k lowest-id vectors, so a fit is reproducible across runs and
    partitionings. Empty clusters keep their previous centroid.

    This supplies the real centroids for :func:`assign_clusters` /
    :func:`semantic_dedup` at scale; the oracle-checked queries use the
    deterministic initialization directly so they stay SQL-expressible.

    ``init``: optional starting centroids (e.g. a previous fit, or the
    ``iters=0`` seed a caller already computed). Skips the two
    initialization jobs (the dim probe and the k-lowest-id collect) —
    a fit from ``init=deterministic_centroids(...)`` is value-identical
    to the default path.
    """
    if init is not None:
        centroids = list(init)
        # ADVICE r10: an empty / wrong-k / ragged init would silently
        # produce a fit inconsistent with the k argument (or crash at
        # centroids[0][1]); validate before any Spark work
        # <= k, not == k: the default path's limit(k) collect returns
        # fewer centroids on a corpus with under k vectors, and a fit
        # seeded from such a fit must stay legal
        if not centroids or len(centroids) > k:
            raise ValueError(
                f"init must supply 1..k={k} centroids, got {len(centroids)}"
            )
        dims = {len(c[1]) for c in centroids}
        if len(dims) != 1:
            raise ValueError(f"init centroids have inconsistent dims: {sorted(dims)}")
        dim = dims.pop()
    else:
        dim = len(emb.select(vec_col).first()[0])
        centroids = deterministic_centroids(emb, k, id_col, vec_col)
    # spherical mean: average UNIT vectors, not raw embeddings —
    # assignment and the inertia objective are purely angular (cosine),
    # and for unit data directions the normalized mean direction is the
    # exact maximizer of the within-cluster cosine sum, which makes
    # Lloyd's objective provably non-increasing per iteration (the
    # in-plan lloyd_improves claim of dedup_semantic_kmeans rests on
    # this, not on fixture luck). A raw mean lets high-magnitude
    # vectors rotate centroids away from the majority direction on
    # mixed-norm corpora. Zero vectors map to null and drop out of avg.
    vnorm = F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"), F.lit(0.0), lambda a, x: a + x * x
        )
    )
    unit = F.when(
        vnorm > 0,
        F.transform(F.col(vec_col).cast("array<double>"), lambda x: x / vnorm),
    )
    for _ in range(iters):
        assigned = assign_clusters(emb, centroids, id_col, vec_col)
        means = (
            assigned.withColumn("_ad", unit)
            .groupBy("cluster_id")
            .agg(*[F.avg(F.element_at("_ad", i + 1)).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        by_id = {}
        for r in means:
            if any(r[f"m{i}"] is None for i in range(dim)):
                continue  # only zero vectors landed here
            m = [float(r[f"m{i}"]) for i in range(dim)]
            # antipodal members can cancel to an exactly-zero mean; a
            # zero centroid makes every cosine NaN (and Spark orders
            # NaN above every double, so it would win every argmax) —
            # keep the previous centroid instead, as the streaming
            # retrain does
            if any(x != 0.0 for x in m):
                by_id[int(r["cluster_id"])] = m
        centroids = [(cid, by_id.get(cid, old)) for cid, old in centroids]
    return centroids


def kmeans_inertia(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean (1 - cosine) to the assigned centroid — the fit objective."""
    assigned = assign_clusters(emb, centroids, id_col, vec_col)
    return float(assigned.agg(F.avg(1.0 - F.col("centroid_sim"))).first()[0])
