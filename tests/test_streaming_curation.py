"""Continuous corpus ingestion: streaming dedup admission.

Pins the contract of ``streaming/curation.py``: a Structured Streaming
ingest over micro-batches admits exactly what sequential batch-mode
admission (the ``operators.dedup.incremental_*`` operators) would admit,
replays are idempotent, and every rejection is justified by an exact
hash match or a verified near-duplicate.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

DDL = "doc_id bigint, text string"

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
BASE_NEAR = "the quick brown fox jumps over the lazy dog near the river bank tonight"
TEXT_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
TEXT_B = "one two three four five six seven eight nine ten eleven twelve thirteen"
TEXT_C = "red orange yellow green blue indigo violet cyan magenta teal maroon navy olive"
TEXT_C_NEAR = "red orange yellow green blue indigo violet cyan magenta teal maroon navy gold"
TEXT_D = "north south east west up down left right forward backward inward outward sideways"
TEXT_D_NEAR = "north south east west up down left right forward backward inward outward diagonally"

BATCHES = [
    [(1, BASE), (2, TEXT_A), (3, TEXT_B)],
    [(4, BASE), (5, BASE_NEAR), (6, TEXT_C)],  # 4 exact-dup, 5 near-dup of corpus
    [
        (7, TEXT_C_NEAR),  # near-dup of corpus (batch 2's doc 6)
        (8, TEXT_A),  # exact dup of corpus
        (9, TEXT_D),  # fresh
        (10, TEXT_D),  # in-batch exact dup of 9
        (11, TEXT_D_NEAR),  # in-batch near-dup of 9
    ],
]
EXPECT_ADMITTED = {1, 2, 3, 6, 9}


def _write_batches(src_dir: str) -> None:
    os.makedirs(src_dir, exist_ok=True)
    t0 = time.time() - 100
    for i, rows in enumerate(BATCHES):
        p = os.path.join(src_dir, f"in-{i}.parquet")
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p, index=False)
        os.utime(p, (t0 + i, t0 + i))  # force file-source processing order


def _sequential_reference(spark):
    """Batch-mode sequential admission with the incremental operators."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.operators import dedup

    corpus = spark.createDataFrame([], DDL)
    for rows in BATCHES:
        batch = spark.createDataFrame(rows, DDL)
        b = dedup.incremental_exact_new(batch, corpus).drop("content_hash")
        pairs = dedup.minhash_near_duplicates(b, threshold=0.7)
        drop = [r.id_b for r in pairs.select("id_b").distinct().collect()]
        b = b.filter(~F.col("doc_id").isin(drop)) if drop else b
        b = dedup.incremental_minhash_new(b, corpus, threshold=0.7)
        corpus = corpus.unionByName(b.select("doc_id", "text"))
    return {r.doc_id for r in corpus.collect()}


def test_sequential_reference_matches_fixture_design(spark):
    assert _sequential_reference(spark) == EXPECT_ADMITTED


def test_stream_ingest_matches_sequential_admission(spark, tmp_path):
    from mandoline_hbase_spark.streaming.curation import read_corpus, start_corpus_ingest

    src = str(tmp_path / "incoming")
    corpus_dir = str(tmp_path / "corpus")
    _write_batches(src)
    stream = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_corpus_ingest(stream, corpus_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = read_corpus(spark, corpus_dir, DDL)
    assert {r.doc_id for r in got.collect()} == EXPECT_ADMITTED
    assert {r.doc_id for r in got.collect()} == _sequential_reference(spark)


def test_admit_batch_replay_is_idempotent(spark, tmp_path):
    from mandoline_hbase_spark.streaming.curation import admit_batch, read_corpus

    corpus_dir = str(tmp_path / "corpus")
    b0 = spark.createDataFrame(BATCHES[0], DDL)
    b1 = spark.createDataFrame(BATCHES[1], DDL)
    assert admit_batch(b0, 0, corpus_dir) == 3
    assert admit_batch(b1, 1, corpus_dir) == 1  # only TEXT_C survives
    before = sorted(r.doc_id for r in read_corpus(spark, corpus_dir, DDL).collect())

    # foreachBatch replay after a crash: same batch id, same input
    assert admit_batch(b1, 1, corpus_dir) == 1
    after = sorted(r.doc_id for r in read_corpus(spark, corpus_dir, DDL).collect())
    assert after == before == [1, 2, 3, 6]

    # index tables carry exactly one row set per admitted doc (no dup rows)
    from mandoline_hbase_spark.streaming.curation import _HASHES_DDL, _read_role

    hashes = _read_role(spark, corpus_dir, "hashes", _HASHES_DDL)
    assert hashes.count() == hashes.distinct().count() == 4


def test_rejections_are_justified(spark, tmp_path):
    """Every non-admitted doc has an exact twin or a verified (exact
    Jaccard >= threshold) near-duplicate among earlier/admitted docs —
    the admission gate never drops a genuinely novel document."""
    from mandoline_hbase_spark.operators.dedup import with_shingle_set
    from mandoline_hbase_spark.streaming.curation import admit_batch, read_corpus

    corpus_dir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES):
        admit_batch(spark.createDataFrame(rows, DDL), i, corpus_dir)
    admitted = {r.doc_id for r in read_corpus(spark, corpus_dir, DDL).collect()}

    all_rows = [r for b in BATCHES for r in b]
    sh = {
        r.doc_id: set(r.sh)
        for r in with_shingle_set(
            spark.createDataFrame(all_rows, DDL), 3, "doc_id", "text"
        ).collect()
    }
    texts = dict(all_rows)
    for doc_id, text in all_rows:
        if doc_id in admitted:
            continue
        earlier = [d for d, _ in all_rows if d < doc_id]
        exact = any(texts[d] == text for d in earlier)
        near = any(
            len(sh[doc_id] & sh[d]) / len(sh[doc_id] | sh[d]) >= 0.7 for d in earlier
        )
        assert exact or near, f"doc {doc_id} rejected without justification"


def test_stage_ordered_batches_are_ascending_id_ranges(spark, tmp_path):
    import glob

    from mandoline_hbase_spark.streaming.curation import stage_ordered_batches

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id bigint, text string"
    )
    staging = str(tmp_path / "staging")
    stage_ordered_batches(docs, staging, n_batches=4)
    files = sorted(glob.glob(staging + "/in-*.parquet"))
    assert len(files) == 4
    # mtimes strictly ascending (processing order) and id ranges disjoint
    # + ascending across files, covering every row exactly once
    import os

    import pandas as pd

    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    seen, prev_max = [], None
    for f in files:
        ids = sorted(pd.read_parquet(f)["doc_id"])
        assert ids, "empty staged batch"
        if prev_max is not None:
            assert ids[0] > prev_max
        prev_max = ids[-1]
        seen.extend(ids)
    assert sorted(seen) == list(range(40))


def test_streamed_exact_admission_is_keep_first(spark, tmp_path):
    from mandoline_hbase_spark.streaming.curation import (
        read_corpus,
        stage_ordered_batches,
        start_corpus_ingest,
    )

    # duplicate texts scattered across id ranges: keep-first-by-id must win
    rows = [(i, f"text {i % 5}") for i in range(20)]
    ddl = "doc_id bigint, text string"
    docs = spark.createDataFrame(rows, ddl)
    staging = str(tmp_path / "staging")
    stage_ordered_batches(docs, staging, n_batches=4)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(staging)
    )
    q = start_corpus_ingest(
        stream, str(tmp_path / "corpus"), str(tmp_path / "ckpt"), threshold=1.5
    )
    assert q.awaitTermination(180)
    got = sorted(
        r.doc_id for r in read_corpus(spark, str(tmp_path / "corpus"), ddl).collect()
    )
    assert got == [0, 1, 2, 3, 4]
