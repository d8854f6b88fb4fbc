"""SQ8 (scalar-quantization) ANN: integer-dot shortlist + exact rerank.

The SQ path's distinguishing property — the shortlist key is an exact
BIGINT, so shortlist membership is bit-reproducible on any engine —
is what lets the PRUNED config carry a full value-level oracle
(``sim_sq_ann_topk``). These tests pin the rest of the contract:
degenerate-config exactness, recall under pruning, determinism, and
integer-dot edge cases (zero vectors, negative components).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sq_full_shortlist_equals_exact(spark):
    """shortlist >= corpus admits everything — the rerank then IS exact
    brute force, same tie-break, same rounding."""
    from mandoline_hbase_spark.operators.similarity import cosine_topk, sq_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = _rows(cosine_topk(emb, queries, k=5))
    full = _rows(sq_topk(emb, queries, k=5, shortlist=1_000_000))
    assert exact == full


def test_sq_pruned_recall(spark):
    """32-of-corpus shortlist keeps recall@5 high on the fixture: int8
    rounding moves cosine by <~1%, far less than the fixture's
    neighbor-score gaps."""
    from mandoline_hbase_spark.operators.similarity import cosine_topk, sq_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact: dict[int, set] = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set] = {}
    for r in sq_topk(emb, queries, k=5, shortlist=32).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9


def test_sq_deterministic(spark):
    """Two runs produce identical rows (integer shortlist keys admit no
    shuffle-order drift)."""
    from mandoline_hbase_spark.operators.similarity import sq_topk
    from mandoline_hbase_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = _rows(sq_topk(emb, queries, k=3, shortlist=16))
    b = _rows(sq_topk(emb, queries, k=3, shortlist=16))
    assert a == b and len(a) == 5 * 3


def test_int_dot_exact_and_edges(spark):
    """int_dot is exact integer math; zero vectors quantize to all-zero
    codes and never crash the pipeline."""
    from mandoline_hbase_spark.operators.similarity import int_dot, quantize_int8, sq_topk

    df = spark.createDataFrame(
        [(1, [3, -2, 7]), (2, [0, 0, 0])], "id int, a array<int>"
    )
    got = df.withColumn("d", int_dot(F.col("a"), F.col("a"))).orderBy("id").collect()
    assert [r.d for r in got] == [3 * 3 + 4 + 49, 0]

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector in the corpus
            (3, [-1.0, 0.5, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    codes = {r.vec_id: list(r.q_vec) for r in quantize_int8(emb).collect()}
    assert codes[2] == [0, 0, 0, 0]
    assert codes[0] == [127, 0, 0, 0]
    assert codes[3] == [-127, 64, 0, 0]  # floor(0.5*127/1 + 0.5) = 64

    # the rerank shares cosine_sim with every other retrieval path, and
    # cosine of a zero vector is undefined there (ANSI divide-by-zero)
    # — so zero vectors are quantizer-safe but excluded from scoring,
    # exactly like cosine_topk
    corpus = emb.filter(F.col("vec_id") != 2)
    out = sq_topk(corpus, corpus.filter(F.col("vec_id") == 0), k=2, shortlist=10).collect()
    ranked = sorted((r.rank, r.neighbor_id) for r in out)
    assert ranked[0] == (1, 1)  # nearest is the 0.9-aligned vector
