"""Continuous corpus ingestion: streaming dedup admission.

The batch-side admission operators (``operators.dedup.incremental_*``)
promise that admitting a batch costs work proportional to the BATCH,
never the corpus. This module is that promise made real under
Structured Streaming: the corpus maintains its own **fingerprint
index** (content hashes, LSH band rows, MinHash signatures + shingle
sets), and every micro-batch is admitted by probing those index tables
— corpus text is never rescanned.

Layout under ``corpus_dir`` (all parquet, one DIRECTORY per micro-batch,
deterministically named ``batch-{id}``, written distributed by
executors — the driver never materializes a batch):

- ``docs/``   admitted documents, the incoming schema verbatim
- ``hashes/`` ``content_hash string`` — the exact-dup gate index
- ``bands/``  ``band int, bh bigint, doc_id bigint`` — LSH probe index
- ``feats/``  ``doc_id bigint, sh array<string>, sig array<bigint>`` —
  verify-stage features (signature prefilter + exact-Jaccard)

Deterministic per-batch directory names + ``mode("overwrite")`` make
``foreachBatch`` replays idempotent: a restarted query rewrites the same
directories instead of appending duplicates — the same replay-safety
idea as the versioned ingest sink (streaming/ingest.py), with directory
identity replacing content addressing.

Admission per batch, in order (cheapest gate first):

1. exact self-dedup — first-of-kind per content hash within the batch
   (min id wins, so replays admit identical rows);
2. exact corpus gate — anti-join of batch hashes vs the hash index;
3. near-dup self-dedup — in-batch LSH candidate pairs, signature
   prefilter, exact-Jaccard verify, larger id of each pair rejected;
4. near-dup corpus gate — one-directional probe: batch band rows join
   corpus band rows (never corpus x corpus), survivors verified
   against corpus features.

At 100 TB the index tables are exactly what would live in a lakehouse
table keyed by hash/band — the per-batch joins shuffle only batch-sized
key sets against them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import dedup

_HASHES_DDL = "content_hash string"
_BANDS_DDL = "band bigint, bh bigint, doc_id bigint"
_FEATS_DDL = "doc_id bigint, sh array<string>, sig array<bigint>"

_ROLES = ("docs", "hashes", "bands", "feats")


def _batch_dir(corpus_dir: str, role: str, batch_id: int) -> str:
    return os.path.join(corpus_dir, role, f"batch-{int(batch_id):010d}")


def _role_batch_dirs(corpus_dir: str, role: str, exclude_batch: int | None = None) -> list[str]:
    d = os.path.join(corpus_dir, role)
    if not os.path.isdir(d):
        return []
    skip = (
        None
        if exclude_batch is None
        else os.path.basename(_batch_dir(corpus_dir, role, exclude_batch))
    )
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.startswith("batch-") and f != skip and os.path.isdir(os.path.join(d, f))
    ]


def _read_role(
    spark: SparkSession,
    corpus_dir: str,
    role: str,
    ddl: str,
    exclude_batch: int | None = None,
) -> DataFrame:
    """Read one corpus index table.

    ``exclude_batch`` drops that batch's own output directory from the
    read: a foreachBatch replay must probe the corpus as it stood BEFORE
    its first attempt, or it would reject its documents against
    themselves and overwrite its output with an empty delta.
    """
    dirs = _role_batch_dirs(corpus_dir, role, exclude_batch)
    if not dirs:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*dirs)


def read_corpus(spark: SparkSession, corpus_dir: str, schema_ddl: str) -> DataFrame:
    """All admitted documents (the incoming schema, passed explicitly so
    an empty corpus still reads cleanly)."""
    dirs = _role_batch_dirs(corpus_dir, "docs")
    if not dirs:
        return spark.createDataFrame([], schema_ddl)
    return spark.read.schema(schema_ddl).parquet(*dirs)


def _verified_reject_ids(
    cands: DataFrame,
    feats_inc: DataFrame,
    feats_ref: DataFrame,
    threshold: float,
    num_hashes: int,
) -> DataFrame:
    """inc ids with a verified (exact-Jaccard >= threshold) match in ref.

    Thin wrapper over the batch operators' shared verify chain
    (``dedup.lsh_verified_match_ids``) so the streaming gate and the
    incremental-admission operator can never drift apart.
    """
    return dedup.lsh_verified_match_ids(
        cands, feats_inc, feats_ref, threshold, num_hashes
    ).withColumnRenamed("inc_id", "doc_id")


def admit_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Admit one micro-batch against the corpus index; returns #admitted.

    Idempotent per ``batch_id``: outputs are fixed-name files, so a
    foreachBatch replay overwrites its own previous attempt.
    """
    from pyspark.sql import Window

    spark = batch_df.sparkSession
    for role in _ROLES:
        os.makedirs(os.path.join(corpus_dir, role), exist_ok=True)

    # 1+2: exact gates — in-batch first-of-kind, then the hash index
    inc = batch_df.withColumn("content_hash", F.md5(F.col(text_col)))
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    inc = inc.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    seen = _read_role(spark, corpus_dir, "hashes", _HASHES_DDL, exclude_batch=batch_id)
    inc = inc.join(seen, "content_hash", "left_anti")
    inc = inc.persist()
    try:
        # batch features, computed once, reused by both near-dup gates
        feats = dedup.doc_shingle_features(
            inc, num_hashes=num_hashes, shingle_n=shingle_n, id_col=id_col, text_col=text_col
        ).select(F.col(id_col).alias("doc_id"), "sh", "sig").persist()
        band_rows = (
            dedup._band_stack(
                feats.select(F.col("doc_id").alias(id_col), "sh", "sig"),
                num_hashes,
                bands,
                id_col,
            )
            .select(
                F.col("band").cast("bigint").alias("band"),
                F.col("bh").cast("bigint").alias("bh"),
                F.col(id_col).cast("bigint").alias("doc_id"),
            )
            .persist()
        )

        # 3: in-batch near-dup — candidates among batch docs, larger id
        # loses; hot buckets degrade to star candidates around the min id
        # (banded_candidate_pairs) so a boilerplate-heavy batch cannot
        # make the self-join quadratic
        self_cands = dedup.banded_candidate_pairs(band_rows, "doc_id").select(
            F.col("id_b").alias("inc_id"), F.col("id_a").alias("ref_id")
        )
        self_reject = _verified_reject_ids(self_cands, feats, feats, threshold, num_hashes)

        # 4: corpus near-dup — one-directional probe of the band index
        corpus_bands = _read_role(spark, corpus_dir, "bands", _BANDS_DDL, exclude_batch=batch_id)
        corpus_feats = _read_role(spark, corpus_dir, "feats", _FEATS_DDL, exclude_batch=batch_id)
        probe_cands = (
            band_rows.alias("i")
            .join(corpus_bands.alias("c"), ["band", "bh"])
            .select(F.col("i.doc_id").alias("inc_id"), F.col("c.doc_id").alias("ref_id"))
            .distinct()
        )
        probe_reject = _verified_reject_ids(probe_cands, feats, corpus_feats, threshold, num_hashes)

        rejected = self_reject.union(probe_reject).distinct().withColumnRenamed("doc_id", id_col)
        admitted = inc.join(rejected, id_col, "left_anti").persist()
        n_admitted = admitted.count()

        # materialize this batch's corpus delta under fixed directory names
        # (replay-safe overwrite), written by executors — no toPandas on
        # the hot path, so a 100 TB/day stream commits without the driver
        # ever holding batch data
        admitted_ids = admitted.select(F.col(id_col).cast("bigint").alias("doc_id"))
        admitted.drop("content_hash").write.mode("overwrite").parquet(
            _batch_dir(corpus_dir, "docs", batch_id)
        )
        admitted.select("content_hash").write.mode("overwrite").parquet(
            _batch_dir(corpus_dir, "hashes", batch_id)
        )
        band_rows.join(admitted_ids, "doc_id", "left_semi").write.mode("overwrite").parquet(
            _batch_dir(corpus_dir, "bands", batch_id)
        )
        feats.join(admitted_ids, "doc_id", "left_semi").write.mode("overwrite").parquet(
            _batch_dir(corpus_dir, "feats", batch_id)
        )
        return n_admitted
    finally:
        inc.unpersist()
        try:
            feats.unpersist()
            band_rows.unpersist()
            admitted.unpersist()
        except NameError:
            pass  # unbound if the batch failed before those stages


def stage_ordered_batches(
    docs: DataFrame,
    staging_dir: str,
    n_batches: int = 4,
    id_col: str = "doc_id",
) -> None:
    """Stage a frame as ``n_batches`` single-file parquets holding
    ASCENDING id ranges, mtime-ordered so the file stream source
    processes them in id order (deterministic admission outcomes:
    keep-first-by-id for the exact gate, regardless of which exact
    cutpoints the ranges use).

    Range cutpoints come from a percentile aggregate (3 scalars on the
    driver — aggregate-bounded, never a corpus-wide single-partition
    ntile window); each range is written by executors and the driver
    only renames the part file into place.
    """
    import glob
    import shutil
    import time

    os.makedirs(staging_dir, exist_ok=True)
    probs = [i / n_batches for i in range(1, n_batches)]
    cuts = docs.agg(
        F.percentile_approx(F.col(id_col), probs, 100000).alias("c")
    ).head()["c"]
    bounds = [None, *cuts, None]
    t0 = time.time() - 1000
    out_i = 0
    for i in range(n_batches):
        part = docs
        if bounds[i] is not None:
            part = part.filter(F.col(id_col) > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col(id_col) <= bounds[i + 1])
        work = os.path.join(staging_dir, f"_work-{i}")
        part.coalesce(1).write.mode("overwrite").parquet(work)
        files = sorted(glob.glob(os.path.join(work, "part-*.parquet")))
        if files:  # degenerate cutpoints can leave a range empty
            dst = os.path.join(staging_dir, f"in-{out_i}.parquet")
            os.replace(files[0], dst)
            os.utime(dst, (t0 + out_i, t0 + out_i))
            out_i += 1
        shutil.rmtree(work, ignore_errors=True)


def start_corpus_ingest(
    stream_df: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    **admit_kwargs,
):
    """Start the continuous-ingest query: every micro-batch is admitted
    against (and appended to) the corpus index via ``foreachBatch``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        admit_batch(batch_df, batch_id, corpus_dir, threshold=threshold, **admit_kwargs)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
