"""Graph operator semantics on hand-built edge lists."""

from __future__ import annotations

from mandoline_hbase_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_triangle_counts_per_node(spark):
    # K4 on {1,2,3,4}: 4 triangles, each node in 3
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = {r.node: r for r in graph.node_metrics(_edges(spark, k4)).collect()}
    assert all(out[n].n_triangles == 3 and out[n].degree == 3 for n in range(1, 5))
    assert all(out[n].clustering == 1.0 for n in range(1, 5))


def test_path_graph_has_no_triangles(spark):
    out = {r.node: r for r in graph.node_metrics(_edges(spark, [(1, 2), (2, 3)])).collect()}
    assert all(r.n_triangles == 0 for r in out.values())
    assert out[2].degree == 2 and out[2].clustering == 0.0
    assert out[1].clustering == 0.0  # degree-1: defined as 0


def test_triangle_plus_tail(spark):
    # triangle {1,2,3} with a tail 3-4
    out = {r.node: r for r in graph.node_metrics(
        _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    ).collect()}
    assert out[1].n_triangles == out[2].n_triangles == out[3].n_triangles == 1
    assert out[4].n_triangles == 0
    assert out[3].degree == 3 and out[3].clustering == round(2 * 1 / (3 * 2), 4)


def test_shared_segment_edges_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # segments: "a b c", "d e f"
            (2, "a b c d e f"),      # shares both -> edge (1,2) shared=2
            (3, "a b c x y z"),      # shares one -> below min_shared
        ],
        "doc_id bigint, text string",
    )
    edges = graph.shared_segment_edges(df, seg_len=3, min_shared=2).collect()
    assert [(e.src, e.dst, e.shared) for e in edges] == [(1, 2, 2)]


def test_pagerank_fixed_point_hand_computed(spark):
    # path 1-2-3, N=3, one iteration:
    # init = 333333333; tele = 50000000; deg = {1:1, 2:2, 3:1}
    # node2 receives 333333333*2 -> 50000000 + 85*666666666//100 = 616666666
    # node1/3 receive 333333333//2=166666666 -> 50000000 + 141666666 = 191666666
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
    edges = _edges(spark, [(1, 2), (2, 3)])
    out = {r.node: r for r in
           graph.pagerank_fixed_point(nodes, edges, iters=1).collect()}
    assert out[2].rank_nano == 616666666
    assert out[1].rank_nano == 191666666 and out[3].rank_nano == 191666666


def test_pagerank_isolated_node_gets_teleport_floor(spark):
    nodes = spark.createDataFrame([(1,), (2,), (9,)], "doc_id bigint")
    edges = _edges(spark, [(1, 2)])
    out = {r.node: r for r in
           graph.pagerank_fixed_point(nodes, edges, iters=3).collect()}
    assert out[9].rank_nano == (100 - 85) * 1_000_000_000 // (100 * 3)
    assert out[1].rank_nano > out[9].rank_nano


def test_shared_segment_edges_hot_segment_degrades_to_star(spark):
    """One segment shared by 2,000 docs emits O(n) star edges, not n²/2
    — the skew guard keeping a boilerplate segment from creating a
    quadratic join task. Hub-pair shared counts stay exact."""
    n = 2000
    rows = [(i, "all rights reserved boilerplate") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    edges = graph.shared_segment_edges(
        df, seg_len=4, min_shared=1, max_bucket_size=64
    )
    got = {(e.src, e.dst, e.shared) for e in edges.collect()}
    assert got == {(0, i, 1) for i in range(1, n)}


def test_shared_segment_edges_guard_off_below_cap(spark):
    """At or under the cap the output is the exact unguarded pair set."""
    df = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(5)], "doc_id bigint, text string"
    )
    edges = graph.shared_segment_edges(df, seg_len=3, min_shared=2, max_bucket_size=5)
    got = {(e.src, e.dst, e.shared) for e in edges.collect()}
    assert got == {(a, b, 2) for a in range(5) for b in range(a + 1, 5)}


def test_shared_segment_edges_window_fallback_identical(spark):
    """hot_broadcast_max=0 forces the distributed sizing-window fallback;
    edges and shared counts must equal the broadcast-split path's."""
    n = 50
    rows = [(i, "all rights reserved boilerplate") for i in range(n)]
    rows += [(1000 + i, "a b c d e f g h") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kw = dict(seg_len=4, min_shared=1, max_bucket_size=10)
    via_bcast = {
        (e.src, e.dst, e.shared)
        for e in graph.shared_segment_edges(df, **kw).collect()
    }
    via_window = {
        (e.src, e.dst, e.shared)
        for e in graph.shared_segment_edges(df, **kw, hot_broadcast_max=0).collect()
    }
    assert via_window == via_bcast
    assert (0, 1, 1) in via_window  # star around the hot segment's min id
