"""Unit semantics for deterministic sampling and connected components."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import dedup, sampling


def _cc(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id bigint")
    edf = spark.createDataFrame(edges or [(None, None)], "id_a bigint, id_b bigint")
    if not edges:
        edf = edf.filter(F.lit(False))
    out = dedup.connected_components(ndf, edf)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_cc_two_components_and_singleton(spark):
    # component {1,2,3} (triangle), component {10,11}, singleton {99}
    got = _cc(spark, [1, 2, 3, 10, 11, 99], [(1, 2), (2, 3), (1, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_cc_long_chain_needs_iterations(spark):
    # path graph 1-2-3-...-8: diameter 7 forces multiple propagation rounds
    nodes = list(range(1, 9))
    edges = [(i, i + 1) for i in range(1, 8)]
    got = _cc(spark, nodes, edges)
    assert got == {n: 1 for n in nodes}


def test_cc_edge_direction_irrelevant(spark):
    assert _cc(spark, [5, 7], [(7, 5)]) == {5: 5, 7: 5}


def test_cc_empty_edges(spark):
    assert _cc(spark, [3, 4], []) == {3: 3, 4: 4}


def _expected_keep(doc_id: int, salt: str, fraction: float) -> bool:
    hex8 = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8]
    return hex8 < sampling.fraction_to_hex(fraction)


def test_sample_deterministic_matches_reference_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    kept = {r["doc_id"] for r in sampling.sample_deterministic(df, 0.3).collect()}
    expected = {i for i in range(200) if _expected_keep(i, "s42", 0.3)}
    assert kept == expected
    # and a second run is identical (no RNG anywhere)
    again = {r["doc_id"] for r in sampling.sample_deterministic(df, 0.3).collect()}
    assert again == kept


def test_sample_fraction_bounds():
    import pytest

    with pytest.raises(ValueError):
        sampling.fraction_to_hex(1.5)


def test_split_oracle_literals_match_fraction_to_hex():
    """The dataset_split_assign / split_leakage_report oracle SQL hardcodes
    the 0.8/0.1/0.1 hash-space boundaries; derive them from the same
    fraction_to_hex the Spark operator uses so the two can never drift
    (a one-off boundary is a ~2^-32-per-doc latent driver mismatch)."""
    import re

    from mandoline_hbase_spark.queries.catalog import oracle_sql_map

    t_train = sampling.fraction_to_hex(0.8)
    t_val = sampling.fraction_to_hex(0.8 + 0.1)  # float sum, as the operator computes it
    for name in ("dataset_split_assign", "split_leakage_report"):
        sql = oracle_sql_map()[name]
        literals = re.findall(r"< '([0-9a-f]{8})'", sql)
        assert literals.count(t_train) >= 1, (name, t_train, literals)
        assert literals.count(t_val) >= 1, (name, t_val, literals)
        for lit in literals:
            assert lit in (t_train, t_val), (name, lit)


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sampling.sample_stratified(df, {"en": 0.2}, "lang", default_fraction=1.0)
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}
    # every fr row kept (fraction_to_hex(1.0) excludes only hex8=='ffffffff')
    fr_expected = {(i, "fr") for i in range(1, 400, 2) if _expected_keep(i, "s42", 1.0)}
    en_expected = {(i, "en") for i in range(0, 400, 2) if _expected_keep(i, "s42", 0.2)}
    assert got == fr_expected | en_expected


def test_topk_per_group_exact_k_and_stable(spark):
    rows = [(i, f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = sampling.sample_topk_per_group(df, k=4, group_col="source")
    rows1 = sorted((r["source"], r["sample_rank"], r["doc_id"]) for r in out.collect())
    assert len(rows1) == 12
    rows2 = sorted(
        (r["source"], r["sample_rank"], r["doc_id"])
        for r in sampling.sample_topk_per_group(df, k=4, group_col="source").collect()
    )
    assert rows1 == rows2
    # ranks are 1..k per group
    per_group = {}
    for src, rank, _ in rows1:
        per_group.setdefault(src, []).append(rank)
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_group.values())


def test_weighted_topk_favors_heavy_weights(spark):
    # 500 light rows (w=1) + 500 heavy rows (w=50): A-ES inclusion
    # probability is proportional to weight, so a top-100 sample should be
    # overwhelmingly heavy rows (E[heavy] ~ 98; allow wide slack).
    rows = [(i, 1.0) for i in range(500)] + [(i, 50.0) for i in range(500, 1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    out = sampling.sample_weighted_topk(df, k=100, weight_col="w").collect()
    assert len(out) == 100
    heavy = sum(1 for r in out if r["doc_id"] >= 500)
    assert heavy >= 85
    # ranks are exactly 1..100
    assert sorted(r["sample_rank"] for r in out) == list(range(1, 101))


def test_weighted_topk_partition_invariant_and_excludes_nonpositive(spark):
    rows = [(i, float(i % 7) - 1.0) for i in range(300)]  # weights in [-1, 5]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    a = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in sampling.sample_weighted_topk(df.repartition(1), 50, "w").collect()
    )
    b = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in sampling.sample_weighted_topk(df.repartition(11), 50, "w").collect()
    )
    assert a == b
    kept = {d for d, _ in a}
    # rows with weight <= 0 (i % 7 in {0, 1}) never appear
    assert not any(d % 7 in (0, 1) for d in kept)


def test_domain_quota_equals_naive_window(spark):
    # includes a NULL group (25 rows, above the quota): the window form
    # keeps nulls as a group of their own, and the quota path must agree
    # — its joins on the group key are null-safe
    rows = [(i, f"d{i % 7}") for i in range(700)] + [
        (10_000 + i, None) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    naive = sampling.sample_topk_per_group(df, k=10, group_col="source", salt="quota")
    naive_set = {(r["source"], r["sample_rank"], r["doc_id"]) for r in naive.collect()}
    stats: dict = {}
    fast = sampling.sample_domain_quota(df, quota=10, group_col="source", stats=stats)
    fast_set = {(r["source"], r["quota_rank"], r["doc_id"]) for r in fast.collect()}
    assert fast_set == naive_set
    assert sum(1 for s, _, _ in fast_set if s is None) == 10
    # the NULL group is served by the PREFILTERED fast path, not by a
    # perpetual deficiency fallback (the audit join is null-safe too)
    assert stats["n_deficient"] == 0


def test_domain_quota_deficiency_fallback_is_exact(spark):
    """Force the prefilter to under-keep (oversample < 1) so the audit
    reruns groups through the exact window — output must still equal
    the naive form."""
    rows = [(i, f"d{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    naive = sampling.sample_topk_per_group(df, k=20, group_col="source", salt="quota")
    naive_set = {(r["source"], r["sample_rank"], r["doc_id"]) for r in naive.collect()}
    fast = sampling.sample_domain_quota(df, quota=20, group_col="source", oversample=0.5)
    fast_set = {(r["source"], r["quota_rank"], r["doc_id"]) for r in fast.collect()}
    assert fast_set == naive_set


def test_domain_quota_small_groups_and_bounds(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, source string")
    out = sampling.sample_domain_quota(df, quota=5, group_col="source").collect()
    assert len(out) == 3  # groups below quota keep everything
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.sample_domain_quota(df, quota=0, group_col="source")


def test_split_by_group_is_leakage_free(spark):
    """Every member of a group lands in the same split, so a near-dup
    pair (same cluster) can never cross train/eval — the property the
    per-doc split cannot give."""
    rows = [(i, i // 5) for i in range(500)]  # clusters of 5
    df = spark.createDataFrame(rows, "doc_id bigint, cluster_id bigint")
    out = sampling.split_by_group(df, "cluster_id")
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert per_cluster == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # group-hash decision: matches the doc-level splitter applied to the id=cluster
    ref = sampling.split_train_val_test(
        df.select(F.col("cluster_id").alias("doc_id")).distinct()
    )
    ref_map = {r["doc_id"]: r["split"] for r in ref.collect()}
    assert all(r["split"] == ref_map[r["cluster_id"]] for r in out.collect())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.split_by_group(df, "cluster_id", (0.5, 0.2, 0.2))


def test_domain_quota_hot_domain_exact(spark):
    """One domain holds 30k of 33k rows (the RefinedWeb hot-domain
    shape); the prefiltered path must still equal the naive window
    exactly, with the window seeing only ~oversample*quota survivors
    of the hot domain rather than all 30k rows."""
    rows = [(i, "hot") for i in range(30_000)] + [
        (100_000 + i, f"cold{i % 30}") for i in range(3_000)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    naive = sampling.sample_topk_per_group(df, k=25, group_col="source", salt="quota")
    naive_set = {(r["source"], r["sample_rank"], r["doc_id"]) for r in naive.collect()}
    fast = sampling.sample_domain_quota(df, quota=25, group_col="source")
    fast_set = {(r["source"], r["quota_rank"], r["doc_id"]) for r in fast.collect()}
    assert fast_set == naive_set
    assert sum(1 for s, _, _ in fast_set if s == "hot") == 25
