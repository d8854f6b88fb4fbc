"""Stream-static enrichment and stream-stream join semantics.

Same strategy as tests/test_streaming.py: events sliced into 3 files,
one micro-batch per file, final result compared against the equivalent
batch plan (the oracle). The stream-stream test uses a generous
watermark so no state is purged mid-run and the streamed result must
equal the batch join exactly; the tight-watermark case is exercised for
state-purge plumbing (it must run and stay a subset).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_slices(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.tables import load_table

    src = tmp_path_factory.mktemp("events_in_joins")
    spark = get_spark(app_name="mandoline-tests")
    pdf = load_table(spark, SF_SMOKE, "events").toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    ordered = pdf.sort_values("ts").reset_index(drop=True)
    k = len(ordered) // 3
    for i, s in enumerate([ordered.iloc[:k], ordered.iloc[k : 2 * k], ordered.iloc[2 * k :]]):
        pq.write_table(
            pa.Table.from_pandas(s.reset_index(drop=True), preserve_index=False),
            src / f"slice_{i}.parquet",
        )
    return str(src), pdf


def _drain(stream_df, name: str, mode: str = "append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_static_enrichment_matches_batch(spark, event_slices):
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.streaming import ingest

    src, pdf = event_slices
    batch_events = spark.createDataFrame(pdf)
    user_dim = (
        batch_events.select("user_id")
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg"), (F.col("user_id") % 5)))
    )
    stream = ingest.read_events_stream(spark, src, max_files_per_trigger=1)
    _drain(ingest.enrich_stream(stream, user_dim), "enriched")
    got = spark.sql("SELECT event_id, segment FROM enriched").toPandas()
    want = (
        ingest.enrich_stream(batch_events, user_dim).select("event_id", "segment").toPandas()
    )
    key = lambda df: sorted(map(tuple, df.itertuples(index=False, name=None)))
    assert key(got) == key(want)
    assert len(got) == len(pdf)  # left join: every event survives


def test_stream_stream_join_matches_batch_with_lax_watermark(spark, event_slices):
    from mandoline_hbase_spark.streaming import ingest

    src, pdf = event_slices
    stream = ingest.read_events_stream(spark, src, max_files_per_trigger=1)
    joined = ingest.click_purchase_stream_join(stream, max_gap_minutes=60, watermark="3650 days")
    _drain(joined, "cp_join")
    got = spark.sql("SELECT click_id, purchase_id FROM cp_join").toPandas()

    batch_events = spark.createDataFrame(pdf)
    want = (
        ingest.click_purchase_stream_join(batch_events, max_gap_minutes=60)
        .select("click_id", "purchase_id")
        .toPandas()
    )
    key = lambda df: sorted(map(tuple, df.itertuples(index=False, name=None)))
    assert len(got) > 0, "fixture should produce click->purchase matches"
    assert key(got) == key(want)


def test_stream_stream_join_tight_watermark_is_sound(spark, event_slices):
    """With a tight watermark, purged state may drop matches but never
    invent them: streamed output must be a subset of the batch join."""
    from mandoline_hbase_spark.streaming import ingest

    src, pdf = event_slices
    stream = ingest.read_events_stream(spark, src, max_files_per_trigger=1)
    joined = ingest.click_purchase_stream_join(stream, max_gap_minutes=60, watermark="30 minutes")
    _drain(joined, "cp_join_tight")
    got = spark.sql("SELECT click_id, purchase_id FROM cp_join_tight").toPandas()

    batch_events = spark.createDataFrame(pdf)
    want = (
        ingest.click_purchase_stream_join(batch_events, max_gap_minutes=60)
        .select("click_id", "purchase_id")
        .toPandas()
    )
    got_set = set(map(tuple, got.itertuples(index=False, name=None)))
    want_set = set(map(tuple, want.itertuples(index=False, name=None)))
    assert got_set <= want_set
