"""Streaming index upkeep: stream-maintained postings == batch index,
BM25 served from the index matches BM25 over the raw corpus."""

from __future__ import annotations

import pytest

from mandoline_hbase_spark.operators import search
from mandoline_hbase_spark.streaming import search as ssearch

DDL = "doc_id bigint, text string"
BATCHES = [
    [(1, "apple banana apple cherry"), (2, "banana banana banana")],
    [(3, "cherry durian cherry apple"), (4, "")],
    [(5, "durian apple banana")],
]


def _write_batches(spark, src: str) -> None:
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, DDL).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/b{i}"
        )


def _run_stream(spark, tmp_path) -> str:
    src = str(tmp_path / "incoming")
    index_dir = str(tmp_path / "index")
    _write_batches(spark, src)
    stream = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(src + "/b*")
    )
    q = ssearch.start_index_maintenance(stream, index_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    return index_dir


def test_streamed_index_equals_batch_index(spark, tmp_path):
    index_dir = _run_stream(spark, tmp_path)
    all_rows = [r for b in BATCHES for r in b]
    full = spark.createDataFrame(all_rows, DDL)
    tf_b, dl_b = search.postings(full)
    tf_s, dl_s = ssearch.read_index(spark, index_dir)
    assert {tuple(r) for r in tf_s.collect()} == {tuple(r) for r in tf_b.collect()}
    assert {tuple(r) for r in dl_s.collect()} == {tuple(r) for r in dl_b.collect()}
    # the empty doc is indexed (dl = 0) — N derives from dl alone
    assert dl_s.count() == 5


def test_bm25_from_streamed_index_matches_corpus_bm25(spark, tmp_path):
    index_dir = _run_stream(spark, tmp_path)
    all_rows = [r for b in BATCHES for r in b]
    full = spark.createDataFrame(all_rows, DDL)
    direct = {(r["rank"], r["doc_id"], r["score"]) for r in
              search.bm25_topk(full, ["apple", "durian"], k=10).collect()}
    served = {(r["rank"], r["doc_id"], r["score"]) for r in
              ssearch.bm25_search(spark, index_dir, ["apple", "durian"], k=10).collect()}
    assert served == direct and served


def test_index_batch_replay_is_idempotent(spark, tmp_path):
    index_dir = str(tmp_path / "index")
    b0 = spark.createDataFrame(BATCHES[0], DDL)
    ssearch.append_index_batch(b0, 0, index_dir)
    tf1, dl1 = ssearch.read_index(spark, index_dir)
    before = ({tuple(r) for r in tf1.collect()}, {tuple(r) for r in dl1.collect()})
    # foreachBatch replay after a crash: same batch id, same input
    ssearch.append_index_batch(b0, 0, index_dir)
    tf2, dl2 = ssearch.read_index(spark, index_dir)
    after = ({tuple(r) for r in tf2.collect()}, {tuple(r) for r in dl2.collect()})
    assert after == before


def test_empty_index_reads_and_serves(spark, tmp_path):
    index_dir = str(tmp_path / "index")
    tf, dl = ssearch.read_index(spark, index_dir)
    assert tf.count() == 0 and dl.count() == 0
    assert ssearch.bm25_search(spark, index_dir, ["apple"]).count() == 0
    with pytest.raises(ValueError):
        ssearch.bm25_search(spark, index_dir, [])


def test_compact_index_preserves_content(spark, tmp_path):
    import os

    index_dir = _run_stream(spark, tmp_path)
    tf_before, dl_before = ssearch.read_index(spark, index_dir)
    before = ({tuple(r) for r in tf_before.collect()}, {tuple(r) for r in dl_before.collect()})
    stats = ssearch.compact_index(spark, index_dir)
    assert stats == {"tf": 1, "dl": 1}
    for role in ("tf", "dl"):
        dirs = [e.name for e in os.scandir(os.path.join(index_dir, role)) if e.is_dir()]
        assert dirs == ["batch-compacted-001"]
    tf_after, dl_after = ssearch.read_index(spark, index_dir)
    after = ({tuple(r) for r in tf_after.collect()}, {tuple(r) for r in dl_after.collect()})
    assert after == before
    # single consolidated dir: a second compaction is a no-op
    assert ssearch.compact_index(spark, index_dir) == {"tf": 1, "dl": 1}
    # BM25 service unchanged
    assert ssearch.bm25_search(spark, index_dir, ["apple"], k=3).count() == 3


def test_compact_index_converges_after_simulated_crash(spark, tmp_path):
    """A crash between the consolidated rename and the source removals
    leaves duplicate rows visible; re-running the compaction folds them
    away (dropDuplicates across batch dirs)."""
    index_dir = _run_stream(spark, tmp_path)
    tf0, dl0 = ssearch.read_index(spark, index_dir)
    want = {tuple(r) for r in tf0.collect()}
    ssearch.compact_index(spark, index_dir)
    # simulate the crash: resurrect one superseded source next to the
    # consolidated dir (duplicate content now visible)
    src = str(tmp_path / "dup")
    spark.createDataFrame(BATCHES[0], DDL).write.mode("overwrite").parquet(src)
    from mandoline_hbase_spark.operators import search as osearch

    tf_b, _ = osearch.postings(spark.read.parquet(src))
    import os

    tf_b.write.mode("overwrite").parquet(
        os.path.join(index_dir, "tf", "batch-0000000000")
    )
    ssearch.compact_index(spark, index_dir)
    tf1, _ = ssearch.read_index(spark, index_dir)
    assert {tuple(r) for r in tf1.collect()} == want


def test_index_round_trip_with_custom_id_col(spark, tmp_path):
    """A non-default id column reads back by NAME — not as an all-null
    doc_id column through a fixed schema."""
    index_dir = str(tmp_path / "index")
    b = spark.createDataFrame(
        [(10, "apple banana"), (20, "banana banana")], "page_id bigint, text string"
    )
    ssearch.append_index_batch(b, 0, index_dir, id_col="page_id")
    tf, dl = ssearch.read_index(spark, index_dir, id_col="page_id")
    assert {tuple(r) for r in dl.collect()} == {(10, 2), (20, 2)}
    assert tf.filter("page_id is null").count() == 0
    out = ssearch.bm25_search(spark, index_dir, ["banana"], k=5, id_col="page_id")
    assert {r["page_id"] for r in out.collect()} == {10, 20}


def test_dedup_read_serves_correctly_through_duplicate_window(spark, tmp_path):
    """After a compaction crash (or a checkpoint-rollback replay) leaves
    duplicate postings visible, the plain read double-counts df_t/N/Σdl
    — dedup=True serves the correct scores until the next compaction."""
    import os

    index_dir = _run_stream(spark, tmp_path)
    terms = ["apple", "durian"]
    want = {(r["rank"], r["doc_id"], r["score"]) for r in
            ssearch.bm25_search(spark, index_dir, terms, k=10).collect()}
    ssearch.compact_index(spark, index_dir)
    # resurrect a folded batch in BOTH roles: the full crash window
    tf_b, dl_b = search.postings(spark.createDataFrame(BATCHES[0], DDL))
    tf_b.write.mode("overwrite").parquet(os.path.join(index_dir, "tf", "batch-0000000000"))
    dl_b.write.mode("overwrite").parquet(os.path.join(index_dir, "dl", "batch-0000000000"))
    plain = {(r["rank"], r["doc_id"], r["score"]) for r in
             ssearch.bm25_search(spark, index_dir, terms, k=10).collect()}
    assert plain != want  # the duplicate window IS wrong without dedup
    served = {(r["rank"], r["doc_id"], r["score"]) for r in
              ssearch.bm25_search(spark, index_dir, terms, k=10, dedup=True).collect()}
    assert served == want
    # and the next compaction run restores the plain read
    ssearch.compact_index(spark, index_dir)
    healed = {(r["rank"], r["doc_id"], r["score"]) for r in
              ssearch.bm25_search(spark, index_dir, terms, k=10).collect()}
    assert healed == want


def test_post_compaction_bucketed_serving_stays_zero_exchange(spark, tmp_path):
    """VERDICT r7 #7 (BM25 side): the zero-Exchange serving assertion
    must hold when the bucketed tables are REBUILT from a compacted
    index — the compaction rewrites the batch-dir layout feeding
    read_index, and a layout change there must not leak an Exchange
    back into the served plan."""
    from mandoline_hbase_spark.operators import bucketed

    index_dir = _run_stream(spark, tmp_path)
    terms = ["apple", "durian"]
    want = {(r["rank"], r["doc_id"], r["score"]) for r in
            ssearch.bm25_search(spark, index_dir, terms, k=10).collect()}
    assert ssearch.compact_index(spark, index_dir) == {"tf": 1, "dl": 1}
    tf, dl = ssearch.read_index(spark, index_dir)
    bucketed.materialize_bucketed(tf, "t_postcomp_tf", ["doc_id"], 4)
    bucketed.materialize_bucketed(dl, "t_postcomp_dl", ["doc_id"], 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        served = search.bm25_topk_from_postings(
            spark.table("t_postcomp_tf"), spark.table("t_postcomp_dl"), terms, k=10
        )
        assert bucketed.exchange_count(served) == 0
        got = {(r["rank"], r["doc_id"], r["score"]) for r in served.collect()}
        assert got == want and want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("t_postcomp_tf", "t_postcomp_dl"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streamed_index_bucketed_serving_zero_exchange(spark, tmp_path):
    """End-to-end deployment shape: the STREAM-maintained index is
    materialized as doc_id-co-bucketed tables (the small-files
    compaction's lakehouse form) and BM25 serves from them with zero
    hash/range Exchange — identical results to serving straight from
    the batch directories."""
    from mandoline_hbase_spark.operators import bucketed

    index_dir = _run_stream(spark, tmp_path)
    terms = ["apple", "durian"]
    want = {(r["rank"], r["doc_id"], r["score"]) for r in
            ssearch.bm25_search(spark, index_dir, terms, k=10).collect()}
    tf, dl = ssearch.read_index(spark, index_dir)
    bucketed.materialize_bucketed(tf, "t_stream_tf", ["doc_id"], 4)
    bucketed.materialize_bucketed(dl, "t_stream_dl", ["doc_id"], 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        served = search.bm25_topk_from_postings(
            spark.table("t_stream_tf"), spark.table("t_stream_dl"), terms, k=10
        )
        assert bucketed.exchange_count(served) == 0
        got = {(r["rank"], r["doc_id"], r["score"]) for r in served.collect()}
        assert got == want and want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("t_stream_tf", "t_stream_dl"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
