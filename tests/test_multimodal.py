"""Multimodal plumbing tests: schema, Arrow batch shapes, byte ops, pruning."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media_df():
    from mandoline_hbase_spark.operators.multimodal import attach_fake_media
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.tables import load_table

    spark = get_spark(app_name="mandoline-tests")
    return attach_fake_media(load_table(spark, SF_SMOKE, "documents")).cache()


def test_media_schema(media_df):
    schema = {f.name: f.dataType.simpleString() for f in media_df.schema.fields}
    assert schema["media"] == "binary"
    meta = dict(
        (f.name, f.dataType.simpleString())
        for f in media_df.schema["media_meta"].dataType.fields
    )
    assert meta == {
        "format": "string",
        "media_type": "string",
        "n_bytes": "bigint",
        "width": "int",
        "height": "int",
        "frame_bytes": "int",
    }


def test_payload_matches_text_bytes(media_df):
    row = media_df.select("text", "media", "media_meta.n_bytes").first()
    assert bytes(row.media) == row.text.encode("utf-8")
    assert row.n_bytes == len(row.text.encode("utf-8"))


def test_byte_histogram_features(media_df):
    from mandoline_hbase_spark.operators.multimodal import byte_histogram_features

    feats = byte_histogram_features(media_df, bins=16).toPandas()
    assert len(feats) == media_df.count()
    assert all(len(f) == 16 for f in feats.features)
    # histograms are normalized: each sums to ~1
    sums = feats.features.apply(sum)
    assert ((sums - 1.0).abs() < 1e-3).all()


def test_frame_sample_strides_and_counts(media_df):
    from mandoline_hbase_spark.operators.multimodal import frame_sample

    frames = frame_sample(media_df, every_k=4).toPandas()
    one = media_df.select("doc_id", "media").first()
    n_full = len(bytes(one.media)) // 64
    expect = len(range(0, n_full, 4))
    got = frames[frames.doc_id == one.doc_id]
    assert len(got) == expect
    # every sampled frame is exactly the 64-byte slice at its offset
    payload = bytes(one.media)
    for _, r in got.iterrows():
        assert bytes(r.frame) == payload[r.frame_no * 64 : (r.frame_no + 1) * 64]


def test_metadata_summary_prunes_payload(spark):
    from mandoline_hbase_spark.operators.multimodal import (
        attach_fake_media,
        media_metadata_summary,
    )
    from mandoline_hbase_spark.sources.tables import load_table

    # uncached: pruning must reach the parquet scan (the cached fixture's
    # InMemoryRelation would hold every column and mask the check — and
    # Spark substitutes any matching cached subtree, so drop the cache)
    spark.catalog.clearCache()
    summary = media_metadata_summary(
        attach_fake_media(load_table(spark, SF_SMOKE, "documents"))
    )
    out = summary.collect()
    assert len(out) == 1 and out[0].media_type == "video"
    # pruning must reach the scan: only `text` (the fake-payload source) is
    # read; the binary media column never materializes
    plan = summary._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<text:string>" in plan


def test_decode_media_gated_without_codec(media_df):
    """Default (Pillow) decoder raises the documented NotImplementedError
    when the codec library is absent; skipped where Pillow exists."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: the gate does not apply")
    except ImportError:
        pass
    from pyspark.errors import PythonException

    from mandoline_hbase_spark.operators.multimodal import decode_media

    # the default decoder gates lazily on the executors, so the
    # NotImplementedError surfaces wrapped in the Python runner's error
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_media(media_df).collect()


def test_decode_media_plumbing_with_injected_decoder(media_df):
    """The Spark-side decode path (mapInPandas, schema, error rows) runs
    end-to-end with any decoder — exercised here with a deterministic
    codec-free decoder: payload bytes tiled into a 2x4 grayscale frame."""
    import numpy as np

    from mandoline_hbase_spark.operators.multimodal import decode_media

    def fake_decoder(payload: bytes):
        if len(payload) < 8:
            raise ValueError("payload too short")
        return np.frombuffer(payload[:8], dtype=np.uint8).reshape(2, 4)

    out = decode_media(media_df, decoder=fake_decoder).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == media_df.count()
    ok = [r for r in out if r.decode_error is None]
    assert ok, "at least one payload decodes"
    for r in ok:
        assert (r.height, r.width, r.n_channels) == (2, 4, 1)
        assert len(r.pixels) == 8
        assert all(0.0 <= p <= 1.0 for p in r.pixels)
    bad = [r for r in out if r.decode_error is not None]
    for r in bad:
        assert r.pixels is None and "too short" in r.decode_error


def test_decode_media_with_pillow():
    """Real decode where Pillow exists (skips in codec-free containers)."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    import PIL.Image

    from mandoline_hbase_spark.operators.multimodal import decode_media
    from mandoline_hbase_spark.session import get_spark

    spark = get_spark()
    img = PIL.Image.fromarray(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3), mode="RGB"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id bigint, media binary")
    row = decode_media(df).collect()[0]
    assert (row.height, row.width, row.n_channels) == (4, 4, 3)
    assert row.decode_error is None
    assert abs(row.pixels[0] - 0.0) < 1e-9 and abs(row.pixels[-1] - 47 / 255.0) < 1e-9


def test_resize_media_nearest_neighbor(spark):
    import numpy as np

    from mandoline_hbase_spark.operators.multimodal import resize_media

    # 4x4 raster 0..15; 2x2 nearest-neighbor picks rows/cols 0 and 2
    raster = bytes(range(16))
    meta = {"format": "fake/raw", "media_type": "image", "n_bytes": 16,
            "width": 4, "height": 4, "frame_bytes": 16}
    df = spark.createDataFrame([(1, bytearray(raster), meta)],
                               "doc_id long, media binary, media_meta map<string,string>")
    out = resize_media(df, out_width=2, out_height=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (2, 2)
    expect = np.frombuffer(raster, dtype=np.uint8).reshape(4, 4)[np.ix_([0, 2], [0, 2])]
    assert bytes(r.media) == expect.tobytes()


def test_resize_media_pads_short_payload(spark):
    from mandoline_hbase_spark.operators.multimodal import resize_media

    meta = {"width": 4, "height": 4}
    df = spark.createDataFrame([(1, bytearray(b"\xff" * 3), meta)],
                               "doc_id long, media binary, media_meta map<string,string>")
    r = resize_media(df, out_width=4, out_height=4).collect()[0]
    assert bytes(r.media)[:3] == b"\xff" * 3 and set(bytes(r.media)[3:]) == {0}


def test_resize_media_rejects_bad_dims(spark):
    import pytest

    from mandoline_hbase_spark.operators.multimodal import resize_media

    df = spark.createDataFrame([(1, bytearray(b"x"), {"width": 1, "height": 1})],
                               "doc_id long, media binary, media_meta map<string,string>")
    with pytest.raises(ValueError):
        resize_media(df, out_width=0, out_height=2)


def test_arrow_histogram_matches_pandas_variant(spark):
    from mandoline_hbase_spark.operators.multimodal import (
        attach_fake_media,
        byte_histogram_features,
        byte_histogram_features_arrow,
    )
    from mandoline_hbase_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = attach_fake_media(load_table(spark, SF_SMOKE, "documents").limit(200))
    a = sorted(
        (r["doc_id"], r["n_bytes"], tuple(r["features"]))
        for r in byte_histogram_features(docs).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_bytes"], tuple(r["features"]))
        for r in byte_histogram_features_arrow(docs).collect()
    )
    assert a == b and len(a) == 200
