"""Skyline operator: exactness under partitioning, dominance semantics."""

from __future__ import annotations

import numpy as np


def _brute(rows, signs):
    out = []
    v = np.array([[r[0] * signs[0], r[1] * signs[1]] for r in rows])
    for i in range(len(rows)):
        dominated = any(
            (v[j] <= v[i]).all() and (v[j] < v[i]).any() for j in range(len(rows)) if j != i
        )
        if not dominated:
            out.append(rows[i])
    return sorted(out)


def test_skyline_matches_brute_force_any_partitioning(spark):
    from mandoline_hbase_spark.operators.skyline import skyline

    rng = np.random.default_rng(7)
    rows = [(float(a), float(b)) for a, b in rng.integers(0, 50, size=(300, 2))]
    expect = _brute(rows, (1.0, -1.0))  # min x, max y
    df = spark.createDataFrame(rows, "x double, y double")
    for parts in (1, 4, 13):
        got = sorted(
            (r.x, r.y)
            for r in skyline(df.repartition(parts), ["x", "y"], ["min", "max"]).collect()
        )
        assert got == expect, f"partitions={parts}"


def test_skyline_keeps_incomparable_ties(spark):
    from mandoline_hbase_spark.operators.skyline import skyline

    rows = [(1.0, 1.0), (1.0, 1.0), (2.0, 0.5), (3.0, 3.0)]  # min both dims
    got = sorted((r.x, r.y) for r in skyline(
        spark.createDataFrame(rows, "x double, y double"), ["x", "y"]
    ).collect())
    # (3,3) dominated by (1,1); duplicates of (1,1) are mutually
    # incomparable (no strict edge) so both survive; (2,0.5) trades off
    assert got == [(1.0, 1.0), (1.0, 1.0), (2.0, 0.5)]
