"""Unit tests for operators/mining.py against hand-computed references.

The catalog oracles (tests/test_queries_oracle.py + tools/sweep.py) pin
the full-table outputs against DuckDB; these tests pin the operator
SEMANTICS on tiny hand-built frames where the expected values are
computed independently in Python (numpy-free closed forms).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import mining


# --------------------------------------------------------------------------
# association_rules
# --------------------------------------------------------------------------
def test_association_rules_hand_computed(spark):
    # 4 baskets; pair (1,2) in 3 of them, (1,3) in 1
    rows = [
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2),
        (12, 1), (12, 2),
        (13, 3),
    ]
    df = spark.createDataFrame(rows, ["b", "item"])
    out = mining.association_rules(
        df, "b", "item", min_item_count=1, min_pair_count=2
    ).collect()
    # only the (1,2) pair reaches count 2 -> two rule directions
    assert [(r.antecedent, r.consequent, r.pair_count) for r in out] == [
        (1, 2, 3),
        (2, 1, 3),
    ]
    r12 = out[0]
    # support = 3/4, confidence(1->2) = 3/|{baskets with 1}| = 3/3
    assert r12.support == 0.75
    assert r12.confidence == 1.0
    # lift = (3 * 4) / (3 * 3)
    assert r12.lift == round(12 / 9, 4)


def test_association_rules_apriori_prune_is_lossless(spark):
    # with min_item_count <= min_pair_count the prune can never drop a
    # qualifying pair: compare against the unpruned run
    rows = [(b, i) for b in range(8) for i in (b % 3, (b + 1) % 3, 5)]
    df = spark.createDataFrame(rows, ["b", "item"])
    pruned = mining.association_rules(
        df, "b", "item", min_item_count=3, min_pair_count=3
    ).collect()
    unpruned = mining.association_rules(
        df, "b", "item", min_item_count=1, min_pair_count=3
    ).collect()
    assert pruned == unpruned
    assert len(pruned) > 0


def test_association_rules_dedups_repeat_lines(spark):
    # the same item twice in one basket counts once (DISTINCT basket-item)
    df = spark.createDataFrame(
        [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8)], ["b", "item"]
    )
    out = mining.association_rules(
        df, "b", "item", min_item_count=1, min_pair_count=2
    ).collect()
    assert [(r.antecedent, r.consequent, r.pair_count) for r in out] == [
        (7, 8, 2),
        (8, 7, 2),
    ]


# --------------------------------------------------------------------------
# chi2_terms
# --------------------------------------------------------------------------
def test_chi2_terms_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="cat dog"),
            Row(doc_id=2, source="a", text="cat"),
            Row(doc_id=3, source="b", text="dog"),
            Row(doc_id=4, source="b", text="dog fish"),
        ]
    )
    out = {
        (r.label, r.term): r
        for r in mining.chi2_terms(docs, "source", top_k=10).collect()
    }
    # 'cat': a=2 in label a, 0 elsewhere; N=4, df_t=2, df_l=2
    # chi2 = 4*(2*2 - 0*0)^2 / (2*2*2*2) = 64/16 = 4
    assert out[("a", "cat")].chi2 == 4.0
    assert out[("a", "cat")].df_in_label == 2
    assert out[("a", "cat")].df_elsewhere == 0
    # 'dog' in label a: a=1, b=2, c=1, d=0 -> ad-bc = -2
    # chi2 = 4*(-2)^2 / (3*1*2*2) = 16/12
    assert out[("a", "dog")].chi2 == round(16 / 12, 4)
    # perfectly discriminative terms rank first in both labels
    assert out[("a", "cat")].rank == 1
    assert out[("b", "fish")].rank <= 2


def test_chi2_presence_is_per_doc_not_per_token(spark):
    # 'cat cat cat' counts once for doc frequency
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="cat cat cat"),
            Row(doc_id=2, source="b", text="dog"),
        ]
    )
    out = {
        (r.label, r.term): r
        for r in mining.chi2_terms(docs, "source", top_k=10).collect()
    }
    assert out[("a", "cat")].df_in_label == 1


# --------------------------------------------------------------------------
# kneser_ney_bigrams
# --------------------------------------------------------------------------
def test_kneser_ney_hand_computed(spark):
    docs = spark.createDataFrame(
        [Row(text="a b a b"), Row(text="a c")]
    )
    out = {
        (r.w1, r.w2): r
        for r in mining.kneser_ney_bigrams(docs, discount=0.75).collect()
    }
    # bigrams: (a,b) x2, (b,a) x1, (a,c) x1 -> types T=3
    # c1(a)=3, n_cont(a)=2; n_hist(b)=1
    # P(b|a) = (2-.75)/3 + (.75*2/3)*(1/3)
    expect = (2 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3)
    assert out[("a", "b")].p_kn == pytest.approx(round(expect, 6))
    assert out[("a", "b")].c12 == 2
    # P(.|a) over the FULL vocabulary sums to 1: seen bigrams from the
    # output plus the backoff-only mass of the unseen continuation
    # (w2='a', Pcont = n_hist(a)/T = 1/3)
    p_from_a = sum(r.p_kn for (w1, _), r in out.items() if w1 == "a")
    unseen = (0.75 * 2 / 3) * (1 / 3)
    assert p_from_a + unseen == pytest.approx(1.0, abs=2e-6)


def test_kneser_ney_single_token_docs_ignored(spark):
    docs = spark.createDataFrame([Row(text="solo"), Row(text="x y")])
    out = mining.kneser_ney_bigrams(docs).collect()
    assert [(r.w1, r.w2) for r in out] == [("x", "y")]


# --------------------------------------------------------------------------
# blocked_er_matches
# --------------------------------------------------------------------------
def test_er_planted_twin_recall_is_total(spark):
    rows = [
        Row(
            c_custkey=i,
            c_name=f"Customer#{i:09d}",
            c_nationkey=i % 3,
            c_mktsegment=["AUTO", "HOUSE"][i % 2],
            c_acctbal=float(1000 * i),
        )
        for i in range(1, 26)
    ]
    out = mining.blocked_er_matches(spark.createDataFrame(rows))
    planted = out.filter(F.col("is_planted") == 1)
    # every one of the 25 customers pairs with its twin, distance 1, gap 0
    got = planted.collect()
    assert len(got) == 25
    assert all(r.name_dist == 1 and r.bal_diff == 0.0 for r in got)
    # twin ids sit above the next power of 10 (no collision with real ids)
    assert all(r.id_b == r.id_a + 100 for r in got)


def test_er_blocking_equals_brute_force(spark):
    # widely-separated balances: only twins match; brute force agrees
    rows = [
        Row(
            c_custkey=i,
            c_name=f"Customer#{i:09d}",
            c_nationkey=0,
            c_mktsegment="AUTO",
            c_acctbal=float(10_000 * i),
        )
        for i in range(1, 8)
    ]
    out = mining.blocked_er_matches(spark.createDataFrame(rows)).collect()
    assert all(r.is_planted == 1 for r in out)
    assert len(out) == 7


# --------------------------------------------------------------------------
# ewma_per_key
# --------------------------------------------------------------------------
def test_ewma_matches_python_fold(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, ts=t0 + dt.timedelta(minutes=i), event_id=i, value=v)
        for i, v in enumerate([10.0, 20.0, 0.0, 5.0])
    ] + [Row(user_id=2, ts=t0, event_id=99, value=42.0)]
    out = {
        r.user_id: r
        for r in mining.ewma_per_key(
            spark.createDataFrame(rows), alpha=0.2
        ).collect()
    }
    s = 10.0
    for x in [20.0, 0.0, 5.0]:
        s = 0.2 * x + 0.8 * s
    assert out[1].ewma_value == round(s, 4)
    assert out[1].n_events == 4
    # single event: EWMA is the value itself
    assert out[2].ewma_value == 42.0


def test_ewma_order_is_ts_then_tiebreak(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # same timestamp: event_id breaks the tie -> fold order (1.0, 9.0)
    rows = [
        Row(user_id=1, ts=t0, event_id=2, value=9.0),
        Row(user_id=1, ts=t0, event_id=1, value=1.0),
    ]
    out = mining.ewma_per_key(spark.createDataFrame(rows), alpha=0.5).collect()
    assert out[0].ewma_value == round(0.5 * 9.0 + 0.5 * 1.0, 4)


def test_ewma_long_series_stays_finite(spark):
    # the fold form must not blow up where the (1-a)^-i rewrite would
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, ts=t0 + dt.timedelta(seconds=i), event_id=i,
            value=float(i % 7))
        for i in range(2000)
    ]
    out = mining.ewma_per_key(spark.createDataFrame(rows), alpha=0.2).collect()
    assert math.isfinite(out[0].ewma_value)
    # recompute exactly
    s = float(0 % 7)
    for i in range(1, 2000):
        s = 0.2 * float(i % 7) + 0.8 * s
    assert out[0].ewma_value == round(s, 4)


# --------------------------------------------------------------------------
# stats_welch / stats_robust query-level pins (scipy-free references)
# --------------------------------------------------------------------------
def test_welch_ab_matches_python_reference(spark):
    from mandoline_hbase_spark.queries.catalog import QUERIES

    out = {
        r.event_type: r
        for r in QUERIES["stats_welch_ab_by_type"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    import hashlib
    import math
    import statistics

    import duckdb

    rows = duckdb.sql(
        "SELECT event_type, user_id, value FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    by_type = {}
    for et, uid, v in rows:
        h = hashlib.md5(f"{uid}:ab-salt".encode()).hexdigest()[:8]
        by_type.setdefault(et, {"A": [], "B": []})[
            "A" if h < "80000000" else "B"
        ].append(v)
    for et, g in by_type.items():
        a, b = g["A"], g["B"]
        va, vb = statistics.variance(a), statistics.variance(b)
        se2 = va / len(a) + vb / len(b)
        t = (statistics.fmean(a) - statistics.fmean(b)) / math.sqrt(se2)
        assert out[et].n_a == len(a) and out[et].n_b == len(b)
        assert out[et].t_stat == pytest.approx(t, abs=2e-3)
        assert out[et].significant == (abs(t) > 1.96)


def test_robust_means_clamp_and_trim(spark):
    from mandoline_hbase_spark.queries.catalog import QUERIES

    rows = (
        QUERIES["stats_robust_value_by_type"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    import duckdb

    bounds = {
        et: (lo, p10, p90, hi)
        for et, lo, p10, p90, hi in duckdb.sql(
            "SELECT event_type, min(value), quantile_cont(value, 0.1),"
            " quantile_cont(value, 0.9), max(value)"
            " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    for r in rows:
        lo, p10, p90, hi = bounds[r.event_type]
        # winsorizing clamps tails to [p10, p90]; trimming drops rows
        # outside it — both means must land inside the cutoff band,
        # which itself sits inside the raw range (1e-4 rounding slack)
        assert lo - 1e-4 <= p10 <= p90 <= hi + 1e-4
        assert p10 - 1e-4 <= r.mean_trimmed <= p90 + 1e-4
        assert p10 - 1e-4 <= r.mean_winsorized <= p90 + 1e-4
        # winsorized keeps clamped tail mass, trimmed drops it: with
        # both tails present they cannot stray past the raw mean by
        # more than the band width
        assert abs(r.mean_winsorized - r.mean_trimmed) <= (p90 - p10)
        assert 0 <= r.n_clamped <= r.n
        assert r.n_clamped <= 0.25 * r.n + 2


def test_er_entity_clusters_twins_collapse_to_real_id(spark):
    rows = [
        Row(
            c_custkey=i,
            c_name=f"Customer#{i:09d}",
            c_nationkey=i % 3,
            c_mktsegment="AUTO",
            c_acctbal=float(10_000 * i),
        )
        for i in range(1, 12)
    ]
    out = {
        r.id: r
        for r in mining.er_entity_clusters(spark.createDataFrame(rows)).collect()
    }
    # 11 people + 11 twins, each twin pair one entity rooted at the real id
    assert len(out) == 22
    for i in range(1, 12):
        assert out[i].entity_id == i and out[i].is_canonical
        assert out[i + 100].entity_id == i and not out[i + 100].is_canonical


def test_ewma_fold_segments_exactly(spark):
    # the docstring's bounded-memory claim: folding a hot key in two
    # segments (second fold seeded with the first's result) is
    # BIT-IDENTICAL to the single fold — same sequence, same order
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    vals = [float((i * 37) % 101) for i in range(500)]
    rows = [
        Row(user_id=1, ts=t0 + dt.timedelta(seconds=i), event_id=i, value=v)
        for i, v in enumerate(vals)
    ]
    full = mining.ewma_per_key(spark.createDataFrame(rows), alpha=0.2).collect()[0]

    s = vals[0]
    for x in vals[1:250]:
        s = 0.2 * x + 0.8 * s
    # seed the second segment's fold with the first segment's result
    for x in vals[250:]:
        s = 0.2 * x + 0.8 * s
    assert full.ewma_value == round(s, 4)
    assert full.n_events == 500
