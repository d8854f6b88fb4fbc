"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Design (SURVEY §7 M5, north-star spec): media travels through the engine
as an opaque ``BINARY`` column with a typed metadata struct — exactly how
the reference treats chunk payloads (opaque ByteBuffers, hbase.clj:130;
dtype/shape interpretation lives in metadata, hbase.clj:266-268).

Spark-side plumbing is REAL and tested: schemas, partitioning,
``mapInPandas`` Arrow batch shapes, byte-level transforms (histogram
features, fixed-stride frame sampling/windowing). Only the actual codec
decode (JPEG/PNG/WAV/MP4) is stubbed — the image/audio libraries are not
in this container — behind ``decode_media``, which raises
``NotImplementedError`` unless a library is importable.

Scale notes: every operator here is map-only over binary payloads — zero
shuffle; Arrow moves the bytes Python-side in columnar batches (set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down if payloads are
large — 10k rows x 10 MB media would OOM an Arrow batch at the default).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame_bytes", IntegerType()),
    ]
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", frame_bytes: int = 64
) -> DataFrame:
    """Deterministic fake media: the UTF-8 text bytes become the payload.

    Entirely JVM-side (encode + struct); gives every row a reproducible
    BINARY column + metadata struct so the downstream plumbing is testable
    without codec libraries.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.lit("video").alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(frame_bytes).alias("frame_bytes"),
        ),
    )


def pillow_decoder(payload: bytes):
    """Default image decoder: bytes -> (H, W, C) uint8 array via Pillow
    when installed, else the vendored pure-Python PNG baseline decoder
    (``operators.png``) for PNG payloads — so the real decode path runs
    even in codec-free containers. Non-PNG payloads without Pillow raise
    NotImplementedError (not ImportError): the documented contract.
    """
    try:
        import PIL.Image
    except ImportError as exc:
        from mandoline_hbase_spark.operators import png as _png

        if _png.is_png(bytes(payload)):
            import numpy as np

            arr = _png.decode_png(bytes(payload))
            if arr.shape[2] == 1:  # grey -> RGB, matching Pillow convert("RGB")
                arr = arr.repeat(3, axis=2)
            elif arr.shape[2] == 2:  # grey+alpha: drop alpha, spread grey
                arr = arr[:, :, :1].repeat(3, axis=2)
            elif arr.shape[2] == 4:  # RGBA: drop alpha
                arr = arr[:, :, :3]
            return np.ascontiguousarray(arr)
        raise NotImplementedError(
            "media decode requires an image codec library (Pillow) for "
            "non-PNG payloads; use byte_histogram_features or frame_sample "
            "for codec-free paths, or inject a decoder"
        ) from exc
    import io

    import numpy as np

    with PIL.Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"))


def decode_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder=None,
) -> DataFrame:
    """Decode media payloads into flattened pixel/sample arrays.

    The Spark-side contract — binary column in, one row per media with
    ``(id, height, width, n_channels, pixels ARRAY<DOUBLE> scaled to
    [0,1], decode_error)`` out, Arrow-batched via ``mapInPandas`` — is
    real and runs with ANY ``decoder: bytes -> ndarray(H, W, C)``;
    rows whose decode raises carry ``decode_error`` and NULL pixels
    instead of failing the job (a 100 TB crawl always contains corrupt
    media). The default decoder is Pillow, imported lazily on the
    executors; in codec-free containers inject a decoder or use the
    codec-free feature paths.
    """
    dec = decoder or pillow_decoder
    schema = (
        f"{id_col} bigint, height int, width int, n_channels int, "
        "pixels array<double>, decode_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[media_col]):
                try:
                    arr = np.asarray(dec(bytes(payload)))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    h, w, c = arr.shape
                    px = (arr.astype(np.float64) / 255.0).ravel().tolist()
                    rows.append((int(rid), h, w, c, px, None))
                except NotImplementedError:
                    raise
                except Exception as exc:  # corrupt payload: record, don't crash
                    rows.append((int(rid), None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "height", "width", "n_channels", "pixels", "decode_error"],
            )

    return df.select(id_col, media_col).mapInPandas(run, schema)


_HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def byte_histogram_features(
    df: DataFrame, bins: int = 16, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Codec-free feature extraction: normalized byte-value histogram.

    ``mapInPandas`` — Arrow-batched, vectorized inside the batch with
    numpy (np.bincount over the concatenated payload per row). This IS
    the real feature-extraction plumbing; a neural encoder would slot
    into the same iterator shape.
    """
    width = 256 // bins

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf // width, minlength=bins)[:bins]
                total = max(len(buf), 1)
                rows.append(
                    (
                        int(doc_id),
                        len(buf),
                        [round(float(h) / total, 6) for h in hist],
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "features"])

    return df.select(id_col, media_col).mapInPandas(extract, _HIST_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    every_k: int = 4,
    id_col: str = "doc_id",
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Sample every k-th fixed-stride frame from a video payload.

    The payload is interpreted as concatenated ``frame_bytes``-sized
    frames (the metadata struct carries the stride). Byte slicing is real;
    only the codec that would produce such frames is faked upstream.
    One output row per sampled frame — an explode-shaped mapInPandas.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf[id_col], pdf[media_col], pdf[meta_col]):
                stride = int(meta["frame_bytes"])
                n_frames = max(len(payload) // stride, 0)
                for f_no in range(0, n_frames, every_k):
                    out.append(
                        (int(doc_id), f_no, payload[f_no * stride : (f_no + 1) * stride])
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_no", "frame"])

    return df.select(id_col, media_col, meta_col).mapInPandas(sample, _FRAME_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("media", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    out_width: int,
    out_height: int,
    id_col: str = "doc_id",
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Resize image payloads to ``out_width x out_height``.

    The payload is interpreted as a row-major ``height x width`` byte
    raster (1 byte/pixel, the metadata struct carries the dims) and
    resampled by nearest-neighbor index selection — a deterministic,
    codec-free resize that numpy expresses exactly; a real interpolating
    resizer (PIL/cv2) would slot into the same iterator unchanged.
    Map-only over Arrow batches: zero shuffle, binary column pruned
    until this operator runs.
    """
    if out_width <= 0 or out_height <= 0:
        raise ValueError(f"output dims must be positive, got {out_width}x{out_height}")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf[id_col], pdf[media_col], pdf[meta_col]):
                w, h = int(meta["width"]), int(meta["height"])
                raster = np.frombuffer(payload, dtype=np.uint8)[: w * h]
                if len(raster) < w * h:  # short payload: pad with zeros
                    raster = np.pad(raster, (0, w * h - len(raster)))
                img = raster.reshape(h, w)
                ys = (np.arange(out_height) * h) // out_height
                xs = (np.arange(out_width) * w) // out_width
                resized = img[np.ix_(ys, xs)]
                out.append((int(doc_id), out_width, out_height, resized.tobytes()))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "media"])

    return df.select(id_col, media_col, meta_col).mapInPandas(resize, _RESIZE_SCHEMA)


def media_metadata_summary(df: DataFrame, meta_col: str = "media_meta") -> DataFrame:
    """Aggregate media stats from metadata only — no payload scan.

    At scale this is the query you run BEFORE deciding what to decode:
    column pruning means the binary column is never read (verify with
    .explain: ReadSchema excludes `media`).
    """
    return df.groupBy(F.col(f"{meta_col}.media_type").alias("media_type")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(f"{meta_col}.n_bytes").alias("total_bytes"),
        F.round(F.avg(f"{meta_col}.n_bytes"), 4).alias("avg_bytes"),
    )


def byte_histogram_features_arrow(
    df: DataFrame, bins: int = 16, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Arrow-native twin of :func:`byte_histogram_features` via
    ``mapInArrow``: RecordBatches are processed directly (numpy views over
    the Arrow buffers), skipping the pandas materialization entirely — on
    wide binary payloads that conversion is the dominant Python-side cost,
    so this is the high-throughput shape for batch feature extraction at
    100 TB. Output values are identical to the pandas variant (pinned by
    an equivalence test).
    """
    width = 256 // bins
    nbins = int(bins)

    def extract(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1)
            out_ids, out_n, out_feats = [], [], []
            for i in range(batch.num_rows):
                payload = payloads[i].as_py()
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf // width, minlength=nbins)[:nbins]
                total = max(len(buf), 1)
                out_ids.append(ids[i].as_py())
                out_n.append(len(buf))
                out_feats.append([round(float(h) / total, 6) for h in hist])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, type=pa.int64()),
                    pa.array(out_n, type=pa.int64()),
                    pa.array(out_feats, type=pa.list_(pa.float64())),
                ],
                names=["doc_id", "n_bytes", "features"],
            )

    return df.select(id_col, media_col).mapInArrow(extract, _HIST_SCHEMA)


def frame_fingerprint_pairs(
    frames_df: DataFrame,
    t_num: int = 1,
    t_den: int = 2,
    max_docs_per_frame: int | None = None,
) -> DataFrame:
    """Near-duplicate media detection by frame-fingerprint Jaccard: two
    payloads whose sampled frames share >= t_num/t_den of their distinct
    frame hashes (the standard video near-dup approach — re-encodes,
    trims and container changes keep most frame content identical while
    whole-file hashes diverge).

    Input: a ``frame_sample`` output (``doc_id, frame_no, frame``).
    Plan: md5 per frame (JVM-side), distinct (doc, fp), then the
    INVERTED-INDEX pair join — docs pair through shared fingerprints,
    never all-pairs, so cost is bounded by fingerprint co-occurrence
    exactly like the LSH band join. The Jaccard threshold is evaluated
    as pure integer arithmetic (``t_den * shared >= t_num * union``), so
    output rows are engine-exact.

    ``max_docs_per_frame`` is the hot-fingerprint guard (a frame of all
    zeros appearing in every file would square the join): fingerprints
    shared by more than the cap are EXCLUDED from pairing — same
    observable-guard contract as the LSH hot-bucket cap. ``None`` (the
    oracle config) pairs through every fingerprint.

    Output: ``(doc_a, doc_b, shared_frames, union_frames)`` for
    qualifying pairs — integer columns only.
    """
    fp = frames_df.select(
        "doc_id", F.md5(F.col("frame")).alias("fp")
    ).distinct()
    if max_docs_per_frame is not None:
        hot = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > int(max_docs_per_frame))
            .select("fp")
        )
        fp = fp.join(hot, "fp", "left_anti")
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_frames"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    union = F.col("na") + F.col("nb") - F.col("shared_frames")
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.lit(int(t_den)) * F.col("shared_frames") >= F.lit(int(t_num)) * union)
        .select(
            "doc_a",
            "doc_b",
            "shared_frames",
            union.cast("long").alias("union_frames"),
        )
    )
