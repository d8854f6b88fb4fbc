"""CDC apply: a change-data-capture stream as a transactional merge sink.

``apply_cdc_stream`` turns a stream of row-change events — the record
schema plus an op column (``u``/``i`` upsert, ``d`` delete) and an
optional sequence column — into versioned MERGEs against a record
variable. This is the standard "apply the CDC feed to the lakehouse
table" pipeline (Debezium → Delta/Hudi/Iceberg), expressed against the
engine's MVCC store.

Exactly-once contract (the same recipe Delta's ``txnAppId/txnVersion``
uses):

- Each ``foreachBatch`` invocation reduces the batch to the LAST op per
  key (by ``seq_col``), applies deletes then upserts via
  :func:`merge_records`, and stamps ``(cdc_app_id, cdc_batch_id)`` into
  the FINAL merge's version metadata — the progress marker commits
  atomically with the data (``extra_meta``).
- On restart/replay the sink reads the newest stamp for its app id and
  skips any batch id ≤ it. Batch ids are CHECKPOINT-scoped, so the app
  id must change with the checkpoint; by default it is derived from the
  checkpoint location.
- A crash between the delete merge and the stamped upsert merge replays
  the whole batch: re-deleting absent keys matches nothing and
  re-upserting identical rows converges, so the retry is harmless — the
  stamp guards against the non-convergent failure (double-applying a
  batch AFTER later batches have run).

Scale: each batch costs two merges, i.e. chunk-level copy-on-write work
proportional to the chunks the batch touches — never a table rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mandoline_hbase_spark.engine import Connection
from mandoline_hbase_spark.merge import merge_records

UPSERT_OPS = ("u", "i")
DELETE_OP = "d"


def last_applied_batch(dataset_path: str, app_id: str) -> int | None:
    """Newest committed ``cdc_batch_id`` stamped by ``app_id`` (None if
    this app never committed). Scans version metadata newest-first and
    stops at the first stamp — O(versions since the last stamp)."""
    conn = Connection(dataset_path, os.path.basename(dataset_path))
    for v in conn.versions(metadata=True):
        meta = v["metadata"]
        if meta.get("cdc_app_id") == app_id and "cdc_batch_id" in meta:
            return int(meta["cdc_batch_id"])
    return None


def apply_cdc_batch(
    spark,
    dataset_path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    variable: str = "records",
    batch_id: int | None = None,
    app_id: str | None = None,
) -> dict:
    """Apply one batch of change events; returns a summary dict.

    The batch is first collapsed to the last op per key: with
    ``seq_col`` the highest sequence wins (ties broken by preferring the
    delete, so a delete+reinsert MUST carry distinct sequences); without
    it duplicate keys are an error (same contract as MERGE)."""
    data_cols = [c for c in batch_df.columns if c not in (op_col, seq_col)]
    final = batch_df
    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(
            F.desc(seq_col), F.when(F.col(op_col) == DELETE_OP, 1).otherwise(0).desc()
        )
        final = (
            batch_df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
    final = final.persist()
    try:
        op_counts = {
            r[op_col]: r["n"]
            for r in final.groupBy(op_col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        unknown = set(op_counts) - set(UPSERT_OPS) - {DELETE_OP}
        if unknown:
            raise ValueError(f"unknown CDC ops {sorted(unknown)}; expected u/i/d")
        n_deletes = op_counts.get(DELETE_OP, 0)
        n_upserts = sum(op_counts.get(o, 0) for o in UPSERT_OPS)
        stamp = {}
        if batch_id is not None:
            stamp = {"cdc_app_id": app_id or "", "cdc_batch_id": int(batch_id)}
        def _merge_with_retry(**kwargs):
            # merge re-plans from the head on every call, so a
            # CommitConflictError from an external writer is retryable
            from mandoline_hbase_spark.errors import CommitConflictError

            last_err = None
            for _ in range(3):
                try:
                    return merge_records(spark, dataset_path, **kwargs)
                except CommitConflictError as e:
                    last_err = e
            raise last_err

        summaries = []
        if n_deletes:
            summaries.append(
                _merge_with_retry(
                    updates_df=final.filter(F.col(op_col) == DELETE_OP).select(*key_cols),
                    key_cols=key_cols,
                    variable=variable,
                    when_matched="delete",
                    insert_not_matched=False,
                    # the stamp rides the LAST merge of the batch
                    extra_meta=stamp if not n_upserts else None,
                )
            )
        if n_upserts:
            summaries.append(
                _merge_with_retry(
                    updates_df=final.filter(F.col(op_col).isin(*UPSERT_OPS)).select(*data_cols),
                    key_cols=key_cols,
                    variable=variable,
                    when_matched="update",
                    insert_not_matched=True,
                    extra_meta=stamp,
                )
            )
        return {
            "batch_id": batch_id,
            "deleted": sum(s["deleted"] for s in summaries),
            "updated": sum(s["updated"] for s in summaries),
            "inserted": sum(s["inserted"] for s in summaries),
            "versions": [s["version"] for s in summaries],
        }
    finally:
        final.unpersist()


def apply_cdc_stream(
    stream_df: DataFrame,
    dataset_path: str,
    key_cols: list[str],
    checkpoint: str,
    op_col: str = "op",
    seq_col: str | None = None,
    variable: str = "records",
    app_id: str | None = None,
    available_now: bool = True,
    query_name: str = "cdc-apply",
):
    """Wire a change-event stream into the merge sink; returns the
    started StreamingQuery. ``app_id`` defaults to a digest of the
    checkpoint location — change both together or neither."""
    import hashlib

    app = app_id or "cdc-" + hashlib.sha1(checkpoint.encode()).hexdigest()[:12]
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        last = last_applied_batch(dataset_path, app)
        if last is not None and batch_id <= last:
            return  # replayed batch: already committed atomically with its stamp
        apply_cdc_batch(
            spark,
            dataset_path,
            batch_df,
            key_cols,
            op_col=op_col,
            seq_col=seq_col,
            variable=variable,
            batch_id=batch_id,
            app_id=app,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
