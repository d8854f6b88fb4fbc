"""ANN recall tests: the approximate paths must track the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _topk_sets(df):
    """{query_id: set(neighbor_id)} from a top-k result frame."""
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_full_probe_equals_exact(spark):
    """Probing every cell degrades IVF to exact brute force — results must
    match the exact top-k exactly (same tie-break)."""
    from mandoline_hbase_spark.operators.similarity import cosine_topk, ivf_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).collect()
    full_probe = ivf_topk(
        emb, queries, dim=64, k=5, n_centroids=8, n_probe=8
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, exact), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, full_probe), key=lambda t: (t[0], t[1])
    )


def test_ivf_partial_probe_recall(spark):
    """6-of-16-cell probing keeps recall@5 >= 0.6 on the fixture."""
    from mandoline_hbase_spark.operators.similarity import cosine_topk, ivf_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(cosine_topk(emb, queries, k=5))
    approx = _topk_sets(ivf_topk(emb, queries, dim=64, k=5, n_centroids=16, n_probe=6))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6


def test_lsh_topk_recall(spark):
    from mandoline_hbase_spark.operators.similarity import cosine_topk, lsh_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(cosine_topk(emb, queries, k=5))
    approx = _topk_sets(
        lsh_topk(emb, queries, dim=64, k=5, n_planes=8, probe_hamming=2)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    # sign-LSH on near-orthogonal synthetic vectors (top cosine ~0.5) is the
    # hardest case for hyperplane hashing; Hamming-2 multiprobe on 8 planes
    # gives ~0.4 expected recall here vs ~1% random baseline
    assert hits / total >= 0.25


def test_random_projection_preserves_relative_distance(spark):
    import numpy as np

    from mandoline_hbase_spark.operators import similarity

    rng = np.random.RandomState(3)
    base = rng.randn(64).astype("float32")
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base + 0.01 * rng.randn(64).astype("float32")]),  # near
        (2, [float(x) for x in rng.randn(64).astype("float32")]),  # far
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r.vec_id: np.array(r[1:]) for r in
           similarity.random_projection(df, out_dim=8, dim=64).collect()}
    d_near = np.linalg.norm(out[0] - out[1])
    d_far = np.linalg.norm(out[0] - out[2])
    assert d_near < d_far


def test_random_projection_deterministic(spark):
    from mandoline_hbase_spark.operators import similarity
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(5)
    a = similarity.random_projection(emb).collect()
    b = similarity.random_projection(emb).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _pq_setup(spark):
    from mandoline_hbase_spark.operators import similarity
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cb = similarity.pq_fit(emb, m=8, k=16)
    return similarity, emb, cb


def test_pq_codes_in_range_and_deterministic(spark):
    similarity, emb, cb = _pq_setup(spark)
    a = sorted((r.vec_id, tuple(r.code)) for r in similarity.pq_encode(emb, cb).collect())
    b = sorted((r.vec_id, tuple(r.code)) for r in similarity.pq_encode(emb, cb).collect())
    assert a == b
    assert all(0 <= c < 16 for _, code in a for c in code)
    assert all(len(code) == 8 for _, code in a)


def test_pq_full_shortlist_equals_exact(spark):
    similarity, emb, cb = _pq_setup(spark)
    n = emb.count()
    queries = emb.limit(3)
    exact = similarity.cosine_topk(emb, queries, k=5)
    pq = similarity.pq_topk(emb, queries, cb, k=5, shortlist=n)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, pq.collect()))


def test_pq_shortlist_recall(spark):
    similarity, emb, cb = _pq_setup(spark)
    queries = emb.limit(5)
    e = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, queries, k=10).collect()}
    p = {(r.query_id, r.neighbor_id) for r in
         similarity.pq_topk(emb, queries, cb, k=10, shortlist=64).collect()}
    assert len(e & p) / len(e) >= 0.6


def test_mrl_served_shortlist_scan_prunes_the_full_vector(spark, tmp_path):
    """The materialized-prefix claim as a plan assertion: the served
    shortlist stage must read (id, prefix) WITHOUT the full embedding
    column — that pruning IS the MRL IO saving — and the served results
    must equal the fit-inline operator exactly."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.operators import ann_index, similarity
    from mandoline_hbase_spark.plans.audit import plan_stats
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    index_dir = str(tmp_path / "mrl")
    ann_index.materialize_mrl_index(emb, index_dir, prefix_dims=16)
    queries = emb.filter(F.col("vec_id") < 3)
    served = ann_index.matryoshka_topk_from_index(
        spark, index_dir, queries, k_shortlist=20, k=5
    )
    inline = similarity.matryoshka_topk(
        emb, queries, prefix_dims=16, k_shortlist=20, k=5
    )
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, inline.collect()))
    # the plan carries a vectors-table scan WITHOUT the embedding column
    scans = plan_stats(served)["scan_columns"]
    assert any("prefix" in s and "embedding" not in s for s in scans), scans
