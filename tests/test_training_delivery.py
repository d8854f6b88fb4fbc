"""Training-data delivery ops: deterministic epoch shuffle + hash split."""

from __future__ import annotations

from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import sampling


def _docs(spark, n=400):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_epoch_shuffle_is_deterministic_and_partitions_rows(spark):
    df = _docs(spark)
    a = sampling.epoch_shuffle(df, epoch=3, n_shards=4).collect()
    b = sampling.epoch_shuffle(df.repartition(7), epoch=3, n_shards=4).collect()
    key = lambda rows: sorted((r.doc_id, r.shard, r.shuffle_pos) for r in rows)  # noqa: E731
    assert key(a) == key(b)  # row order / partitioning never changes the permutation
    # every row lands exactly once; positions are 0..len(shard)-1 per shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.shuffle_pos)
    assert sum(len(v) for v in by_shard.values()) == 400
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    # hash sharding balances: no shard more than 2x the ideal
    assert max(len(v) for v in by_shard.values()) <= 2 * (400 // 4)


def test_epoch_shuffle_differs_across_epochs(spark):
    df = _docs(spark, 200)
    e1 = {(r.doc_id, r.shard, r.shuffle_pos) for r in sampling.epoch_shuffle(df, 1, 4).collect()}
    e2 = {(r.doc_id, r.shard, r.shuffle_pos) for r in sampling.epoch_shuffle(df, 2, 4).collect()}
    assert e1 != e2  # a new epoch is a new permutation


def test_epoch_shuffle_has_no_global_window(spark):
    df = sampling.epoch_shuffle(_docs(spark), 1, 8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_split_fractions_and_stability(spark):
    df = _docs(spark, 2000)
    out = sampling.split_train_val_test(df, (0.8, 0.1, 0.1)).collect()
    counts = {}
    for r in out:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # pure function of the id: adding rows never reassigns existing ones
    bigger = {
        r.doc_id: r.split
        for r in sampling.split_train_val_test(_docs(spark, 3000), (0.8, 0.1, 0.1)).collect()
    }
    for r in out:
        assert bigger[r.doc_id] == r.split


def test_compression_ratio_signal(spark):
    from mandoline_hbase_spark.operators import text

    df = spark.createDataFrame(
        [
            (1, "a a a a a a a a a a a a a a a a a a a a a a a a a a a a"),
            (2, "the quick brown fox jumps over the lazy dog near a riverbank"),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in text.with_compression_ratio(df).collect()}
    # repetitive text compresses far better than prose
    assert out[1].compression_ratio < out[2].compression_ratio
    assert 0 < out[1].compression_ratio < 1
    assert out[3].compression_ratio == 0.0 and out[3].compressed_bytes == 0
    import zlib

    assert out[2].compressed_bytes == len(
        zlib.compress(df.collect()[1].text.encode(), 6)
    )
