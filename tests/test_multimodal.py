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


# --- vendored PNG baseline codec -------------------------------------------


def test_png_round_trip_all_channel_counts():
    import numpy as np

    from mandoline_hbase_spark.operators import png

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(5, 9, c), dtype=np.uint8)
        out = png.decode_png(png.encode_png(arr))
        assert np.array_equal(out, arr), f"channels={c}"


def test_png_decodes_all_filter_types():
    """Hand-filter scanlines with each of the five PNG filters and check
    the decoder reconstructs the reference image exactly."""
    import struct
    import zlib

    import numpy as np

    from mandoline_hbase_spark.operators import png

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, c = arr.shape
    stride = w * c

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    flat = arr.reshape(h, stride).astype(np.int32)
    for y, ftype in zip(range(h), (0, 1, 2, 3, 4)):
        line = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            ul = prev[i - c] if i >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = prev[i]
            elif ftype == 3:
                pred = (left + prev[i]) >> 1
            else:
                pred = paeth(left, prev[i], ul)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_png(payload), arr)


def test_png_matches_pillow_where_available():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    import PIL.Image

    from mandoline_hbase_spark.operators import png

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="PNG")
    assert np.array_equal(png.decode_png(buf.getvalue()), arr)
    with PIL.Image.open(io.BytesIO(png.encode_png(arr))) as img:
        assert np.array_equal(np.asarray(img.convert("RGB")), arr)


def test_decode_media_default_decoder_runs_on_png(spark):
    """The REAL default decode path (no injected decoder) executes in CI:
    PNG payloads decode on the executors through the vendored baseline
    (or Pillow where installed); a corrupt payload yields an error row."""
    import numpy as np

    from mandoline_hbase_spark.operators import png
    from mandoline_hbase_spark.operators.multimodal import decode_media

    imgs = {
        1: np.full((2, 3, 3), 10, dtype=np.uint8),
        2: (np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 7) % 256,
    }
    rows = [(k, bytearray(png.encode_png(v))) for k, v in imgs.items()]
    rows.append((3, bytearray(b"\x89PNG\r\n\x1a\ntruncated")))
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r.doc_id: r for r in decode_media(df).collect()}
    for k, v in imgs.items():
        r = out[k]
        assert (r.height, r.width, r.n_channels) == (2, 3, 3)
        assert r.decode_error is None
        assert np.allclose(
            np.array(r.pixels).reshape(2, 3, 3), v.astype(np.float64) / 255.0
        )
    assert out[3].decode_error is not None and out[3].pixels is None


def test_frame_fingerprint_pairs_hand_case(spark):
    """3 payloads of 2 frames each: A==B (jaccard 1), C shares one frame
    with A/B (jaccard 1/3 < 1/2 -> excluded at t=1/2, included at t=1/4)."""
    from mandoline_hbase_spark.operators import multimodal

    fa = b"x" * 64
    fb = b"y" * 64
    fc = b"z" * 64
    rows = [
        (1, 0, fa), (1, 1, fb),
        (2, 0, fa), (2, 1, fb),
        (3, 0, fa), (3, 1, fc),
    ]
    frames = spark.createDataFrame(rows, "doc_id bigint, frame_no int, frame binary")
    strict = {
        (r.doc_a, r.doc_b): (r.shared_frames, r.union_frames)
        for r in multimodal.frame_fingerprint_pairs(frames, 1, 2).collect()
    }
    assert strict == {(1, 2): (2, 2)}
    loose = {
        (r.doc_a, r.doc_b): (r.shared_frames, r.union_frames)
        for r in multimodal.frame_fingerprint_pairs(frames, 1, 4).collect()
    }
    assert loose == {(1, 2): (2, 2), (1, 3): (1, 3), (2, 3): (1, 3)}


def test_frame_fingerprint_hot_guard_excludes_ubiquitous_frames(spark):
    """A fingerprint present in more docs than the cap pairs nobody:
    docs sharing ONLY the hot frame drop out, pairs sharing cold frames
    survive."""
    from mandoline_hbase_spark.operators import multimodal

    hot = b"\x00" * 64
    cold = b"c" * 64
    rows = [
        (1, 0, hot), (1, 1, cold),
        (2, 0, hot), (2, 1, cold),
        (3, 0, hot),
        (4, 0, hot),
    ]
    frames = spark.createDataFrame(rows, "doc_id bigint, frame_no int, frame binary")
    # unguarded at t=1/4: every doc pairs with every other through hot
    un = multimodal.frame_fingerprint_pairs(frames, 1, 4).collect()
    assert {(r.doc_a, r.doc_b) for r in un} == {
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)
    }
    # cap 3 excludes the 4-doc hot frame: only the cold-frame pair stays
    g = multimodal.frame_fingerprint_pairs(frames, 1, 4, max_docs_per_frame=3).collect()
    assert {(r.doc_a, r.doc_b): (r.shared_frames, r.union_frames) for r in g} == {
        (1, 2): (1, 1)
    }
