"""KMV (k-minimum-values, theta-style) sketches for distinct-count SET
OPERATIONS over groups.

HLL (``hll_sketch_agg``/``hll_union``, used by the events rollups) merges
unions only; a KMV sketch additionally answers INTERSECTION estimates —
"how many users did BOTH A and B" — without an exact distinct, via the
classic estimator (Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations", SIGMOD'07):

- sketch(S)    = the k smallest distinct 64-bit hashes of S
- distinct(S) ≈ (k - 1) / u_k          where u_k = the k-th minimum,
                                       mapped to (0, 1]
- union:   merge = k smallest of (A ∪ B)   (sketches are mergeable)
- A ∩ B:  rho = |merge ∩ A ∩ B| / k; estimate = rho * distinct(A ∪ B)

Scale design: the sketch build is the standard two-level combine —
stage 1 computes a per-partition partial sketch per group *inside* each
task (bounded state: k hashes per (group, partition)), stage 2 merges
partials with one groupBy whose input is at most ``k x n_partitions``
hashes per group. No collect_set over raw values ever happens, so a
group with a billion distinct members still shuffles only partial
sketches. All estimator math is JVM-side array expressions.

The reference backend has no sketch surface (SURVEY.md §2.2 lists only
primitive aggregation); this extends the engine's mergeable-sketch
family (HLL union rollups, count-min heavy hitters, quantile sketches)
with distinct-set algebra for the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# xxhash64 is signed; shift into [1, 2^64-1] double space for the
# (k-1)/u_k estimator. Stored sketch values stay signed longs (sorted
# signed order == sorted unsigned order after the +2^63 shift applied
# uniformly, because we sort the raw signed values and shift only when
# estimating — signed sort IS the shifted sort).
_TWO_63 = float(2**63)
_TWO_64 = float(2**64)


def _norm(h):
    """Map a signed-64 hash to (0, 1]: u = (h + 2^63 + 1) / 2^64."""
    return (h.cast("double") + F.lit(_TWO_63) + F.lit(1.0)) / F.lit(_TWO_64)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """One row per group: ``sketch ARRAY<BIGINT>`` (ascending, ≤ k hashes).

    Two-level combine (see module docstring): partial sketches are built
    per (group, input partition) with bounded state, then merged. The
    only shuffle carries partial sketches, never raw distinct values.
    """
    # NULL never hashes: a null value is not a distinct member under
    # COUNT(DISTINCT) semantics, and xxhash64(NULL) would otherwise add
    # the seed constant as a phantom member.
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, F.xxhash64(F.col(value_col)).alias("_h")
    )
    # Stage 1: per-partition partial sketches via mapInPandas — the k-min
    # selection happens INSIDE the task with state folded ACROSS Arrow
    # batches (at most k hashes per group held at any time), so each task
    # emits exactly one k-hash row per group it saw and the downstream
    # shuffle carries k x partitions rows per group, never raw distinct
    # hashes. (A groupBy(collect_set) here would serialize every
    # partition's full distinct set into the shuffle — unbounded by k.)
    gtypes = dict(df.dtypes)
    schema = (
        ", ".join(f"`{c}` {gtypes[c]}" for c in group_cols) + ", _partial array<bigint>"
    )
    kk = int(k)
    gcols = list(group_cols)

    def _partial_sketches(pdfs):
        import numpy as np
        import pandas as pd

        acc: dict = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for key, sub in pdf.groupby(gcols, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                h = np.unique(sub["_h"].to_numpy())[:kk]  # sorted ascending
                prev = acc.get(key)
                acc[key] = h if prev is None else np.unique(np.concatenate([prev, h]))[:kk]
        if not acc:
            return
        yield pd.DataFrame(
            [(*key, h.tolist()) for key, h in acc.items()], columns=[*gcols, "_partial"]
        )

    partials = hashed.mapInPandas(_partial_sketches, schema)
    # Stage 2: merge ≤ k x n_partitions hashes per group.
    return (
        partials.groupBy(*group_cols)
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("_partial")))),
                1,
                k,
            ).alias("sketch")
        )
    )


def kmv_merge_two(a, b, k: int):
    """Column expression merging two sketch arrays (union sketch, ≤ k)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_estimate(sketch, k: int):
    """Distinct-count estimate column from a sketch array column.

    Exact (== size) when the group had fewer than k distinct values;
    (k-1)/u_k otherwise.
    """
    full = F.size(sketch) >= k
    u_k = _norm(F.element_at(sketch, k))
    return F.when(full, (F.lit(float(k - 1)) / u_k)).otherwise(
        F.size(sketch).cast("double")
    )


def kmv_intersect_estimate(a, b, k: int):
    """Intersection-cardinality estimate column for two sketch arrays.

    rho = |merge ∩ A ∩ B| / |merge| over the union sketch, scaled by the
    union estimate. Exact when both sides were under k (sketches are the
    full hash sets, so the intersection of the sets IS the answer).
    """
    merge = kmv_merge_two(a, b, k)
    both = F.size(F.array_intersect(merge, F.array_intersect(a, b)))
    exact = (F.size(a) < k) & (F.size(b) < k)
    est = both.cast("double") / F.size(merge) * kmv_estimate(merge, k)
    return F.when(exact, F.size(F.array_intersect(a, b)).cast("double")).otherwise(est)


def kmv_jaccard_estimate(a, b, k: int):
    """Jaccard-similarity estimate column for two sketch arrays."""
    merge = kmv_merge_two(a, b, k)
    both = F.size(F.array_intersect(merge, F.array_intersect(a, b)))
    return both.cast("double") / F.size(merge)


def distinct_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise distinct-value overlap between groups, one row per
    unordered group pair: sketch-estimated distinct counts of each side,
    their intersection, and Jaccard.

    The pair join runs over one SKETCH ROW per group (tiny — group
    count, not corpus size), so the quadratic part is in sketch space;
    the corpus is touched exactly once to build the sketches. At 100 TB
    this is the only tractable shape for "overlap matrix across N
    segments" questions.
    """
    sk = kmv_sketch(df, [group_col], value_col, k)
    a = sk.select(F.col(group_col).alias("group_a"), F.col("sketch").alias("sk_a"))
    b = sk.select(F.col(group_col).alias("group_b"), F.col("sketch").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    return pairs.select(
        "group_a",
        "group_b",
        F.round(kmv_estimate(F.col("sk_a"), k), 2).alias("est_distinct_a"),
        F.round(kmv_estimate(F.col("sk_b"), k), 2).alias("est_distinct_b"),
        F.round(kmv_intersect_estimate(F.col("sk_a"), F.col("sk_b"), k), 2).alias(
            "est_intersection"
        ),
        F.round(kmv_jaccard_estimate(F.col("sk_a"), F.col("sk_b"), k), 4).alias(
            "est_jaccard"
        ),
    )


def topk_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    partial_k: int = 200,
) -> DataFrame:
    """Mergeable top-k heavy hitters with deterministic error bounds
    (SpaceSaving-style truncated-summary merge).

    The count-min sketch (text.countmin_sketch) estimates frequencies of
    KNOWN candidates; this op FINDS the candidates: each partition emits
    its exact per-value counts truncated to the ``partial_k`` largest,
    recording the largest truncated count as that partial's epsilon. The
    merge sums surviving counts; a value absent from some partial can
    have lost at most that partial's epsilon, so

        count_lo <= true count <= count_lo + sum(all epsilons)

    and every value with true count > sum(epsilons) is GUARANTEED to
    survive. Shuffle carries <= partial_k rows per partition — bounded
    like the KMV sketch above, never the full value-frequency table.
    Raise ``partial_k`` to shrink the bound (epsilon is the
    (partial_k+1)-th count of a partition).

    Output: top ``k`` by ``count_lo`` desc with ``count_hi`` the upper
    bound (``count_lo`` is exact when every partial kept the value, i.e.
    ``n_partials`` == the partition count).
    """
    pk = int(partial_k)

    def _partials(pdfs):
        import pandas as pd

        # fold counts across ALL of the partition's Arrow batches first:
        # one partial (and one epsilon) per PARTITION, which is what the
        # n_partials == partition-count exactness criterion requires —
        # truncating per batch would under-count values that straddle
        # batches while still reporting a full n_partials
        acc = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            c = pdf["_v"].value_counts()
            acc = c if acc is None else acc.add(c, fill_value=0)
        if acc is None:
            return
        acc = acc.astype("int64").sort_values(ascending=False, kind="stable")
        kept = acc.iloc[:pk]
        eps = int(acc.iloc[pk]) if len(acc) > pk else 0
        out = pd.DataFrame({"_v": kept.index, "_c": kept.to_numpy().astype("int64")})
        out["_eps"] = 0
        # one epsilon row per partial (value NULL) so the merge can
        # total the bound without a separate pass
        yield pd.concat(
            [out, pd.DataFrame({"_v": [None], "_c": [0], "_eps": [eps]})],
            ignore_index=True,
        )

    vtype = dict(df.dtypes)[value_col]
    partials = df.select(F.col(value_col).alias("_v")).mapInPandas(
        _partials, f"_v {vtype}, _c bigint, _eps bigint"
    )
    eps_total = partials.agg(F.sum("_eps").alias("e")).select(
        F.col("e").cast("bigint").alias("_eps_total")
    )
    merged = (
        partials.filter(F.col("_v").isNotNull())
        .groupBy("_v")
        .agg(
            F.sum("_c").cast("bigint").alias("count_lo"),
            F.count(F.lit(1)).cast("bigint").alias("n_partials"),
        )
    )
    return (
        merged.crossJoin(F.broadcast(eps_total))
        .select(
            F.col("_v").alias(value_col),
            "count_lo",
            (F.col("count_lo") + F.col("_eps_total")).cast("bigint").alias("count_hi"),
            "n_partials",
        )
        .orderBy(F.desc("count_lo"), F.asc(value_col))
        .limit(k)
    )
