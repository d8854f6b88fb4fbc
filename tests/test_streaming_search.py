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
