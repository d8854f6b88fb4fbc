"""Distributed skyline (Pareto-optimal set) operator.

The skyline of a relation under per-column preference directions is the
set of rows not dominated by any other row (s dominates r iff s is at
least as good on every dimension and strictly better on one). Spark has
no built-in skyline; the standard distributed recipe (cf. "Integration
of Skyline Queries into Spark SQL", EDBT 2023 — pattern reference only)
is two-phase:

1. **local phase** — each partition computes its own skyline with a
   vectorized block-nested-loop (numpy dominance tests inside
   ``mapInPandas``). Dominated rows die where they live; nothing
   shuffles but survivors.
2. **global phase** — the union of local skylines (small: the global
   skyline is a subset and local pruning is aggressive on shuffled
   data) is reduced on a single task to the exact global skyline.

The result is EXACT, not approximate: local pruning can never remove a
global skyline point (domination is transitive and partition-local
domination implies global domination), and the global pass removes
every cross-partition domination. At 100 TB the single global task is
safe as long as the union of local skylines fits one executor — true
for low-dimensional skylines, which shrink, not grow, with data volume
per partition; for hostile dimensionality, raise partition count so
local sets stay small, or pre-partition by a dominance-preserving grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline(
    df: DataFrame, cols: list[str], directions: list[str] | None = None
) -> DataFrame:
    """Exact distributed skyline of ``df`` over ``cols``.

    ``directions``: per-column ``"min"`` (default) or ``"max"``.
    Returns the full input rows of the skyline set.
    """
    directions = directions or ["min"] * len(cols)
    if len(directions) != len(cols):
        raise ValueError("directions must match cols")
    bad = [d for d in directions if d not in ("min", "max")]
    if bad:
        raise ValueError(f"directions must be 'min' or 'max', got {bad}")
    signs = [1.0 if d == "min" else -1.0 for d in directions]
    out_schema = df.schema
    names = list(df.columns)
    c, s = list(cols), list(signs)

    # defined inside so closures capture it BY VALUE: executor python
    # workers may not have this package on sys.path (same rule as
    # engine.write_variable_from_df's self-contained build_chunk)
    def _skyline_block(values, signs_arr):
        import numpy as np

        v = values * signs_arr
        n = len(v)
        keep = np.ones(n, dtype=bool)
        order = np.lexsort(v.T[::-1])  # sorted by first dim, then ties
        v = v[order]
        # the skyline accumulator lives in a preallocated ndarray so the
        # per-row dominance test is one vectorized compare — no list ->
        # array conversion per input row (skyline appends are rare
        # relative to rows, so growth cost amortizes)
        kept = np.empty_like(v)
        n_kept = 0
        for i in range(n):
            row = v[i]
            if n_kept:
                k = kept[:n_kept]
                # SFS invariant: checking against prior SKYLINE rows
                # suffices — domination is transitive
                dominated = ((k <= row).all(axis=1) & (k < row).any(axis=1)).any()
                if dominated:
                    keep[order[i]] = False
                    continue
            kept[n_kept] = row
            n_kept += 1
        return np.flatnonzero(keep)

    def local(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf[c].to_numpy(dtype=np.float64)
            yield pdf.iloc[_skyline_block(vals, np.array(s))]

    local_sky = df.mapInPandas(local, out_schema)

    def global_phase(key, pdf):
        import numpy as np

        if len(pdf) == 0:
            return pdf
        pdf = pdf[names]
        vals = pdf[c].to_numpy(dtype=np.float64)
        return pdf.iloc[_skyline_block(vals, np.array(s))]

    # one-key reduction: the union of local skylines is small by
    # construction; this is the standard phase-2 merge, not a driver
    # collect (it runs as one executor task)
    return (
        local_sky.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda key, pdf: global_phase(key, pdf.drop(columns=["_g"])), out_schema)
    )
