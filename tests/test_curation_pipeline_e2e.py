"""The LLM-curation layer composed with the lakehouse layer, end to end:

raw documents -> policy verdicts (quality/lang/PII/length gates) ->
near-dup cluster pruning -> epoch-sharded training view, LANDED as a
record table through the native datasource (zone maps + bloom filters),
then incrementally MERGEd when documents are re-scored — the pipeline a
real training-data platform runs, on one MVCC store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-curation-e2e",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse"},
    )
    register(spark)
    yield spark


def test_curation_to_lakehouse_pipeline(ds_spark, tmp_path):
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.merge import merge_records
    from mandoline_hbase_spark.operators import dedup, sampling, text
    from mandoline_hbase_spark.sources.tables import load_table

    schema = mk_schema(
        {"root": "curation-e2e.mandoline.io", "base_path": str(tmp_path)}
    )
    schema.create_dataset("corpus")
    conn = schema.connect("corpus")
    path = conn.dataset_dir

    docs = load_table(ds_spark, SF, "documents")

    # 1. policy gates: quality + language + PII + length, one scan
    scored = text.redact_pii(text.with_language_id(text.with_quality_scores(docs)))
    kept = scored.filter(
        (F.col("quality_score") >= 0.5)
        & (F.col("lang_pred") == "en")
        & (F.col("n_pii") == 0)
    ).select("doc_id", "text", "source", "quality_score")

    # 2. near-dup pruning: keep each cluster's min-id doc
    clusters = dedup.near_duplicate_clusters(docs, threshold=0.7)
    canonical = clusters.filter(F.col("is_canonical")).select("doc_id")
    curated = kept.join(canonical, "doc_id", "left_semi")

    # 3. epoch-sharded training view, landed through the datasource with
    #    zone maps on the shard column and bloom filters on doc_id
    sharded = sampling.epoch_shuffle(curated, epoch=1, n_shards=4).select(
        "doc_id", "text", "source", "quality_score", "shard", "shuffle_pos"
    )
    (
        sharded.repartitionByRange(4, "shard", "shuffle_pos")
        .write.format("mandoline")
        .option("path", path)
        .option("variable", "records")
        .option("bloom_columns", "doc_id")
        .mode("append")
        .save()
    )

    def read_records():
        return (
            ds_spark.read.format("mandoline")
            .option("path", path)
            .option("variable", "records")
            .option("form", "records")
            .load()
        )

    landed = read_records()
    n_curated = curated.count()
    assert landed.count() == n_curated > 0
    # every kept doc passed every gate and is its cluster's canonical
    assert landed.filter(F.col("quality_score") < 0.5).count() == 0
    # shard-scoped loader read: pushed filter prunes to the shard's chunks
    shard_rows = landed.filter("shard = 2").collect()
    assert {r["shard"] for r in shard_rows} == {2}
    assert sorted(r["shuffle_pos"] for r in shard_rows) == list(
        range(len(shard_rows))
    )

    # 4. re-scoring wave: quality model v2 bumps 5 docs — MERGE re-points
    #    only the touched chunks, history stays queryable
    sample_ids = [r["doc_id"] for r in landed.limit(5).collect()]
    updates = landed.filter(F.col("doc_id").isin(sample_ids)).withColumn(
        "quality_score", F.lit(0.99)
    ).select("doc_id", "text", "source", "quality_score", "shard", "shuffle_pos")
    out = merge_records(ds_spark, path, updates, ["doc_id"])
    assert out["updated"] == 5 and out["inserted"] == 0

    after = read_records()
    assert after.filter(F.col("quality_score") == 0.99).count() == 5
    assert after.count() == n_curated  # upsert, not append
    # time travel: the pre-merge version still reads the original scores
    before = (
        ds_spark.read.format("mandoline")
        .option("path", path)
        .option("variable", "records")
        .option("form", "records")
        .option("version", str(out["base_version"]))
        .load()
    )
    assert before.filter(F.col("quality_score") == 0.99).count() == 0
