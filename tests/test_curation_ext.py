"""Semantic dedup, n-gram mining, and token-budget mixing semantics.

Oracle equivalence runs in the driver's sweep (and
tests/test_queries_oracle.py); these pin the operator-level properties
the oracle compare can't see: plan shape, determinism under
repartitioning, and the budget/cluster bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


def _load_emb(spark, sf):
    from mandoline_hbase_spark.sources.tables import load_table

    return load_table(spark, sf, "embeddings")


def test_assign_clusters_is_shuffle_free(spark):
    from mandoline_hbase_spark.operators import semdedup

    emb = _load_emb(spark, SF_SMOKE)
    cents = semdedup.deterministic_centroids(emb, k=8)
    plan = (
        semdedup.assign_clusters(emb, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_semantic_pairs_stay_within_cluster(spark):
    from mandoline_hbase_spark.operators import semdedup

    emb = _load_emb(spark, SF_ORACLE)
    cents = semdedup.deterministic_centroids(emb, k=8)
    assigned = {
        r["vec_id"]: r["cluster_id"]
        for r in semdedup.assign_clusters(emb, cents).select("vec_id", "cluster_id").collect()
    }
    pairs = semdedup.semantic_near_dup_pairs(emb, k=8, threshold=0.4).collect()
    assert pairs, "fixture should contain within-cluster near-dups"
    for p in pairs:
        assert p["id_a"] < p["id_b"]
        assert assigned[p["id_a"]] == assigned[p["id_b"]] == p["cluster_id"]
        assert p["sim"] >= 0.4


def test_semantic_dedup_drops_larger_ids_only(spark):
    from mandoline_hbase_spark.operators import semdedup

    emb = _load_emb(spark, SF_ORACLE)
    out = semdedup.semantic_dedup(emb, k=8, threshold=0.4)
    rows = {r["vec_id"]: r["is_kept"] for r in out.collect()}
    assert len(rows) == emb.count()  # total function: every vector decided
    dropped = {v for v, kept in rows.items() if not kept}
    assert dropped, "threshold 0.4 should drop something at sf0.01"
    pair_bs = {
        r["id_b"] for r in semdedup.semantic_near_dup_pairs(emb, k=8, threshold=0.4).collect()
    }
    assert dropped == pair_bs


def test_mix_budget_respected_and_deterministic(spark):
    from mandoline_hbase_spark.operators import sampling
    from mandoline_hbase_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    out = sampling.mix_to_token_budget(docs, tokens_per_source=800, n_buckets=4)
    per_bucket = (
        out.groupBy("source", "bucket").agg(F.sum("n_tok").alias("tot")).collect()
    )
    assert per_bucket
    for r in per_bucket:
        assert r["tot"] <= 200  # 800 / 4 buckets
    # Partitioning-invariant: identical selection from a reshuffled input.
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in sampling.mix_to_token_budget(
            docs.repartition(13), tokens_per_source=800, n_buckets=4
        ).collect()
    }
    assert a == b


def test_top_ngrams_counts_and_short_docs(spark):
    from mandoline_hbase_spark.operators import text

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "one"), (4, "   ")],
        "doc_id long, text string",
    )
    rows = {r["gram"]: (r["total_tf"], r["doc_freq"]) for r in text.top_ngrams(df, n=2, k=10).collect()}
    # doc1 bigrams: "a b","b a","a b","b c"; doc2: "a b"; docs 3-4: none.
    assert rows["a b"] == (3, 2)
    assert rows["b a"] == (1, 1)
    assert rows["b c"] == (1, 1)
    assert len(rows) == 3


def test_incremental_admission_properties(spark):
    from mandoline_hbase_spark.operators import dedup
    from mandoline_hbase_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    incoming = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)

    admitted = dedup.incremental_minhash_new(incoming, corpus, threshold=0.7)
    adm_ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}
    inc_ids = {r["doc_id"] for r in incoming.select("doc_id").collect()}
    assert adm_ids <= inc_ids
    assert adm_ids != inc_ids, "fixture should reject some near-dups"

    # Every rejected doc really has a corpus near-duplicate at >= 0.7.
    rejected = incoming.filter(~F.col("doc_id").isin(list(adm_ids)))
    pairs = dedup.jaccard_pairs(
        docs,
        rejected.select(F.col("doc_id").alias("id_a")).crossJoin(
            corpus.select(F.col("doc_id").alias("id_b"))
        ),
    )
    best = {
        r["id_a"]: r["jaccard"]
        for r in pairs.groupBy("id_a").agg(F.max("jaccard").alias("jaccard")).collect()
    }
    for doc_id in inc_ids - adm_ids:
        assert best.get(doc_id, 0.0) >= 0.7

    # Exact gate: no admitted hash may exist in the corpus.
    adm_exact = dedup.incremental_exact_new(incoming, corpus)
    corpus_hashes = {
        r[0] for r in corpus.select(F.md5("text")).collect()
    }
    for r in adm_exact.select("content_hash").collect():
        assert r["content_hash"] not in corpus_hashes


def test_kmeans_fit_reduces_inertia_and_is_deterministic(spark):
    from mandoline_hbase_spark.operators import semdedup

    emb = _load_emb(spark, SF_ORACLE)
    init = semdedup.deterministic_centroids(emb, k=8)
    i0 = semdedup.kmeans_inertia(emb, init)
    fitted = semdedup.kmeans_fit(emb, k=8, iters=3)
    i1 = semdedup.kmeans_inertia(emb, fitted)
    assert i1 <= i0 + 1e-12, (i0, i1)
    # Reproducible across partitionings (avg is order-sensitive in
    # principle, but per-dimension means here agree to ~1e-12; the fit
    # contract is "same data -> same clusters", checked via assignment).
    fitted2 = semdedup.kmeans_fit(emb.repartition(7), k=8, iters=3)
    a1 = semdedup.assign_clusters(emb, fitted).select("vec_id", "cluster_id").collect()
    a2 = semdedup.assign_clusters(emb, fitted2).select("vec_id", "cluster_id").collect()
    assert {(r[0], r[1]) for r in a1} == {(r[0], r[1]) for r in a2}


def test_kmeans_one_lloyd_step_matches_numpy_spherical_mean(spark):
    """ADVICE r7: value-level pin of the UPDATE step itself (the r7
    switch to unit-vector means changed fitted centroids with only an
    inertia/determinism check covering it). One Lloyd step must equal
    the numpy reference: assign by max cosine (ties to the lowest
    centroid id), then per-cluster mean of UNIT vectors, empty or
    zero-cancelling clusters keeping their previous centroid."""
    import numpy as np

    from mandoline_hbase_spark.operators import semdedup

    emb = _load_emb(spark, SF_ORACLE)
    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    assert (norms > 0).all()  # the fixture has no zero vectors

    cents0 = semdedup.deterministic_centroids(emb, k=8)
    C = np.array([c for _, c in cents0], dtype=np.float64)
    sims = (X / norms[:, None]) @ (C / np.linalg.norm(C, axis=1)[:, None]).T
    lab = sims.argmax(axis=1)  # first max = lowest index = lowest cid
    unit = X / norms[:, None]
    expected = []
    for j, (cid, old) in enumerate(cents0):
        members = unit[lab == j]
        m = members.mean(axis=0) if len(members) else np.zeros(X.shape[1])
        expected.append(old if not m.any() else m.tolist())

    fitted = semdedup.kmeans_fit(emb, k=8, iters=1)
    assert [cid for cid, _ in fitted] == [cid for cid, _ in cents0]
    for (cid, got), want in zip(fitted, expected):
        assert np.allclose(got, want, rtol=1e-9, atol=1e-12), cid


def test_countmin_overestimates_within_bound(spark):
    from mandoline_hbase_spark.queries.catalog import QUERIES

    rows = QUERIES["text_bigram_cms_estimate"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 25
    # Total bigram occurrences = the sketch's N.
    from mandoline_hbase_spark.operators import text
    from mandoline_hbase_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    docs = load_table(spark, SF_ORACLE, "documents")
    n = (
        docs.select(
            F.greatest(
                F.size(F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: F.length(t) > 0)) - 1,
                F.lit(0),
            ).alias("m")
        )
        .agg(F.sum("m"))
        .first()[0]
    )
    assert n > 0  # the bound claim is computed IN-PLAN against this N
    for r in rows:
        # cms_ok = est >= exact AND est <= exact + 2N/width, verified in-plan
        assert r["cms_ok"] is True, r


def test_matmul_pairs_match_fold_pairs(spark):
    """The BLAS scale path (per-cluster gram matrix in applyInPandas) finds
    exactly the fold path's pair set, with sims equal to float tolerance —
    the two execution strategies implement one operator."""
    from mandoline_hbase_spark.operators import semdedup

    emb = _load_emb(spark, SF_ORACLE)
    fold = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in semdedup.semantic_near_dup_pairs(emb, k=8, threshold=0.4).collect()
    }
    blas = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in semdedup.semantic_near_dup_pairs_matmul(emb, k=8, threshold=0.4).collect()
    }
    assert set(fold) == set(blas)
    assert max(abs(fold[p] - blas[p]) for p in fold) < 1e-9


def test_chunk_documents_covers_and_overlaps(spark):
    from mandoline_hbase_spark.operators.packing import chunk_documents

    rows = [(1, " ".join(f"t{i}" for i in range(100))), (2, "a b c"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = chunk_documents(df, chunk_tokens=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 tokens -> ceil((100-32)/24)+1 = 4 windows
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in d1] == [0, 1, 2, 3]
    assert d1[0]["chunk_text"].split()[:2] == ["t0", "t1"]
    assert d1[1]["chunk_text"].split()[0] == "t24"  # stride offset
    assert d1[-1]["n_tok"] == 100 - 3 * 24  # final remainder window
    # consecutive windows overlap by chunk - stride = 8 tokens
    assert d1[0]["chunk_text"].split()[-8:] == d1[1]["chunk_text"].split()[:8]
    # short doc: single window, all tokens
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tok"] == 3
    # empty doc: zero tokens -> zero chunks (split(trim('')) yields ['']
    # but the operator special-cases whitespace-only text)
    assert 3 not in by_doc
    # disjoint mode reconstructs the document exactly
    disjoint = chunk_documents(df.filter("doc_id = 1"), 25, 25).collect()
    glued = " ".join(
        r["chunk_text"] for r in sorted(disjoint, key=lambda r: r["chunk_idx"])
    )
    assert glued == rows[0][1]


def test_chunk_documents_validates_args(spark):
    import pytest
    from mandoline_hbase_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_contrastive_triplets_validity_and_determinism(spark):
    from mandoline_hbase_spark.operators import contrastive, semdedup
    from mandoline_hbase_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = contrastive.contrastive_triplets(emb, threshold=0.4, n_buckets=4)
    rows = out.collect()
    assert len(rows) > 0
    # a negative is never its own anchor/positive, and never a positive
    # of its anchor (in either orientation)
    pos = {
        (r["anchor_id"], r["positive_id"]) for r in rows
    }
    pos_all = pos | {(b, a) for a, b in pos}
    for r in rows:
        assert r["negative_id"] not in (r["anchor_id"], r["positive_id"])
        assert (r["anchor_id"], r["negative_id"]) not in pos_all
    # deterministic across partitionings
    again = contrastive.contrastive_triplets(
        emb.repartition(13), threshold=0.4, n_buckets=4
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # scale path: LSH/semantic candidate pairs slot in as positives
    lsh_pairs = semdedup.semantic_near_dup_pairs_matmul(emb, k=8, threshold=0.4)
    out2 = contrastive.contrastive_triplets(emb, positives=lsh_pairs, n_buckets=4)
    assert out2.count() > 0


def test_contrastive_min_by_matches_window_reference(spark):
    """r10: the negative draw became a min_by hash aggregate; it must
    select exactly the row the pre-r10 row_number()=1 window (ordered
    by salted pair hash asc, cand_id asc) selected."""
    import hashlib

    from mandoline_hbase_spark.operators import contrastive
    from mandoline_hbase_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = contrastive.contrastive_triplets(
        emb, threshold=0.4, n_buckets=4
    ).collect()
    assert out
    # reference: recompute the draw in plain Python from first principles
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]

    def bucket(i):
        return int(hashlib.md5(f"{i}:neg42".encode()).hexdigest()[:8], 16) % 4

    pos = {(r["anchor_id"], r["positive_id"]) for r in out}
    pos_all = pos | {(b, a) for a, b in pos}
    for r in out:
        a, p = r["anchor_id"], r["positive_id"]
        cands = [
            c
            for c in ids
            if bucket(c) == bucket(a)
            and c not in (a, p)
            and (a, c) not in pos_all
        ]
        want = min(
            cands,
            key=lambda c: (hashlib.md5(f"{a}:{c}:neg42".encode()).hexdigest(), c),
        )
        assert r["negative_id"] == want, (a, p, r["negative_id"], want)


def test_kmeans_fit_init_matches_default(spark):
    """r10: kmeans_fit(init=seed) skips the two init jobs; the fitted
    centroids must be value-identical to the default init path."""
    from mandoline_hbase_spark.operators import semdedup
    from mandoline_hbase_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    seed = semdedup.kmeans_fit(emb, k=4, iters=0)
    via_init = semdedup.kmeans_fit(emb, k=4, iters=2, init=seed)
    default = semdedup.kmeans_fit(emb, k=4, iters=2)
    assert via_init == default


def test_kmeans_fit_init_is_validated():
    """ADVICE r10: init=[] used to IndexError at centroids[0][1], and a
    wrong-k or ragged init silently produced a fit inconsistent with
    the k argument. All three must fail loudly, before any Spark work
    (emb=None proves no job is touched)."""
    import pytest

    from mandoline_hbase_spark.operators import semdedup

    with pytest.raises(ValueError, match="1..k"):
        semdedup.kmeans_fit(None, k=2, iters=1, init=[])
    with pytest.raises(ValueError, match="1..k"):
        semdedup.kmeans_fit(
            None, k=1, iters=1, init=[(1, [0.1]), (2, [0.2])]
        )
    with pytest.raises(ValueError, match="inconsistent dims"):
        semdedup.kmeans_fit(
            None, k=2, iters=1, init=[(1, [0.1]), (2, [0.2, 0.3])]
        )
