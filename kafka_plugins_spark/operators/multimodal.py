"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators (one Python invocation per batch, never per
row). PNG decode is REAL (pure zlib+numpy codec,
:mod:`kafka_plugins_spark.functions.png_codec` — full filter set,
CRC-checked), so is baseline JPEG (pure numpy Huffman+IDCT codec,
:mod:`kafka_plugins_spark.functions.jpeg_codec` — grayscale/4:4:4/
4:2:0; both driver-oracle-verified via :func:`image_pixel_stats`), and
so is WAV audio (pure RIFF/PCM codec,
:mod:`kafka_plugins_spark.functions.wav_codec`, driver-oracle-verified
via :func:`audio_sample_stats`), and so is VIDEO for the MJPEG/AVI
case (pure RIFF demuxer :mod:`kafka_plugins_spark.functions.avi_codec`
+ per-frame JPEG decode, driver-oracle-verified via
:func:`video_frame_stats`). Inter-frame codecs (H.264 et al.) are out
of scope without real libraries; unknown binary payloads fall back to
the documented deterministic fake grid in ``_decode_image_bytes``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_plugins_spark.functions import avi_codec, jpeg_codec, png_codec, wav_codec

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary blobs derived from md5)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        blob = hashlib.md5(f"{seed}:{i}".encode()).digest() * (8 + i % 32)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 128 if kind != "audio" else None,
                48 + i % 96 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
                blob,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_bytes(data: bytes) -> np.ndarray:
    """Image bytes → uint8 pixel array.

    PNG and baseline JPEG both decode for REAL — pure numpy codecs
    (:mod:`kafka_plugins_spark.functions.png_codec`,
    :mod:`kafka_plugins_spark.functions.jpeg_codec`): PNG covers the
    full filter set CRC-checked; JPEG covers baseline sequential
    grayscale/4:4:4/4:2:0 with loud refusals for progressive et al.
    Remaining non-image bytes (audio/video frames) map to a
    deterministic fake grid so the surrounding Arrow plumbing stays
    exercised; swap in PIL/libvips here on a cluster that has them."""
    if data[:8] == png_codec.PNG_SIGNATURE:
        return png_codec.decode_png(data)
    if data[:2] == jpeg_codec.JPEG_SIGNATURE:
        return jpeg_codec.decode_jpeg(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    side = max(int(len(arr) ** 0.5), 1)
    return arr[: side * side].reshape(side, side)


def extract_features(media: DataFrame) -> DataFrame:
    """Binary → fixed-dim feature vector, Arrow batch at a time.

    The feature is a byte-histogram projection (deterministic stand-in
    for a real CNN/fbank featurizer); vectorized numpy per batch.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for data in pdf["data"]:
                buf = np.frombuffer(data, dtype=np.uint8) if data is not None else np.zeros(1, np.uint8)
                hist, _ = np.histogram(buf, bins=FEATURE_DIM, range=(0, 256))
                denom = max(len(buf), 1)
                feats.append((hist / denom).astype(np.float32))
                nbytes.append(len(buf))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, index=pdf.index, dtype="int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)


def byte_histogram(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id", bins: int = 16
) -> DataFrame:
    """Integer byte histogram of a binary column, Arrow batch at a time.

    The driver-verifiable core of :func:`extract_features`: bin k counts
    bytes with high nibble k (bin width 256/bins), plus total n_bytes —
    all integers, so the result hash-matches a SQL oracle exactly (no
    float32 drift). Same mapInPandas shape a real featurizer uses.
    """
    width = 256 // bins
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, False),
            T.StructField("n_bytes", T.LongType(), False),
        ]
        + [T.StructField(f"h{k}", T.LongType(), False) for k in range(bins)]
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: pdf[id_col], "n_bytes": [], **{f"h{k}": [] for k in range(bins)}}
            for data in pdf[data_col]:
                buf = np.frombuffer(data, dtype=np.uint8) if data is not None else np.zeros(0, np.uint8)
                counts = np.bincount(buf // width, minlength=bins)
                rows["n_bytes"].append(len(buf))
                for k in range(bins):
                    rows[f"h{k}"].append(int(counts[k]))
            yield pd.DataFrame(rows, index=pdf.index)

    return df.select(id_col, data_col).mapInPandas(hist, schema=out_schema)


def synthesize_png_table(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → (id, data) with REAL PNG bytes, generated distributed
    (mapInPandas, never a driver loop): image ``i`` is a greyscale
    (6 + i%4) × (8 + i%5) grid whose pixel ``j`` is ``(i*7 + j) % 256``,
    encoded with scanline filter ``i % 5`` — so a corpus covers every
    unfilter path in the decoder. The closed-form pixel rule is what
    makes the decode side ORACLE-CHECKABLE end-to-end (a SQL engine can
    recompute the expected stats without decoding anything)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                h, w = 6 + i % 4, 8 + i % 5
                arr = ((i * 7 + np.arange(h * w)) % 256).astype(np.uint8).reshape(h, w)
                blobs.append(png_codec.encode_png(arr, filter_type=i % 5))
            yield pd.DataFrame({id_col: pdf[id_col], "data": blobs})

    out_schema = T.StructType(
        [
            T.StructField(id_col, ids.schema[id_col].dataType, False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    # the id column is a tiny, often single-split input driving expensive
    # per-row codec work — spread it across the cluster before the fan-out
    # (a round-robin shuffle of just the ids; cost O(ids), win = full
    # parallelism for the codec stage)
    par = ids.sparkSession.sparkContext.defaultParallelism
    return ids.select(id_col).repartition(par).mapInPandas(gen, schema=out_schema)


def synthesize_jpeg_table(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → (id, data) with REAL baseline-JPEG bytes, generated
    distributed (mapInPandas): image ``i`` is a greyscale image of
    (2 + i%2) × (2 + i%3) 8×8 blocks where block (by, bx) is CONSTANT
    with value ``(i*17 + by*31 + bx*7) % 256``, encoded at unit quant.
    Block-constant pixels have a DC-only DCT whose unit-quant round trip
    is bit-exact (test_jpeg.py), so the closed-form block rule survives
    the lossy codec and a SQL engine can recompute the decoded pixel
    stats without decoding anything — the same oracle pattern as
    :func:`synthesize_png_table`."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                bh, bw = 2 + i % 2, 2 + i % 3
                by, bx = np.meshgrid(np.arange(bh), np.arange(bw), indexing="ij")
                vals = ((i * 17 + by * 31 + bx * 7) % 256).astype(np.uint8)
                arr = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                blobs.append(jpeg_codec.encode_jpeg(arr))
            yield pd.DataFrame({id_col: pdf[id_col], "data": blobs})

    out_schema = T.StructType(
        [
            T.StructField(id_col, ids.schema[id_col].dataType, False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    # the id column is a tiny, often single-split input driving expensive
    # per-row codec work — spread it across the cluster before the fan-out
    # (a round-robin shuffle of just the ids; cost O(ids), win = full
    # parallelism for the codec stage)
    par = ids.sparkSession.sparkContext.defaultParallelism
    return ids.select(id_col).repartition(par).mapInPandas(gen, schema=out_schema)


def synthesize_wav_table(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → (id, data) with REAL RIFF/PCM WAV bytes, generated
    distributed (mapInPandas): clip ``i`` is mono 16-bit PCM with
    ``64 + i%33`` samples at rate ``8000 + (i%3)*4000``, sample ``k`` =
    ``((i*13 + k*7) % 4001) - 2000``. PCM is uncompressed, so the
    closed-form sample rule survives encode→decode exactly and a SQL
    engine can recompute the decoded stats — same oracle pattern as the
    PNG/JPEG tables."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                n = 64 + i % 33
                k = np.arange(n, dtype=np.int64)
                samples = (((i * 13 + k * 7) % 4001) - 2000).astype(np.int16)
                blobs.append(wav_codec.encode_wav(samples, 8000 + (i % 3) * 4000))
            yield pd.DataFrame({id_col: pdf[id_col], "data": blobs})

    out_schema = T.StructType(
        [
            T.StructField(id_col, ids.schema[id_col].dataType, False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    # the id column is a tiny, often single-split input driving expensive
    # per-row codec work — spread it across the cluster before the fan-out
    # (a round-robin shuffle of just the ids; cost O(ids), win = full
    # parallelism for the codec stage)
    par = ids.sparkSession.sparkContext.defaultParallelism
    return ids.select(id_col).repartition(par).mapInPandas(gen, schema=out_schema)


def audio_sample_stats(
    media: DataFrame, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """Decode audio (real RIFF/PCM path) and emit integer sample
    statistics — the oracle-checkable core of an audio featurizer
    (a real fbank/MFCC front end starts from exactly these decoded
    frames). Arrow-batched mapInPandas; decode errors fail loudly."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType, False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("n_channels", T.IntegerType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("sample_sum", T.LongType(), False),
            T.StructField("sample_min", T.LongType(), False),
            T.StructField("sample_max", T.LongType(), False),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: pdf[id_col], "n_samples": [], "n_channels": [],
                    "sample_rate": [], "sample_sum": [], "sample_min": [],
                    "sample_max": []}
            for data in pdf[data_col]:
                samples, rate = wav_codec.decode_wav(bytes(data))
                rows["n_samples"].append(samples.shape[0])
                rows["n_channels"].append(samples.shape[1])
                rows["sample_rate"].append(rate)
                rows["sample_sum"].append(int(samples.sum(dtype=np.int64)))
                rows["sample_min"].append(int(samples.min()))
                rows["sample_max"].append(int(samples.max()))
            yield pd.DataFrame(rows, index=pdf.index)

    return media.select(id_col, data_col).mapInPandas(stats, schema=out_schema)


def synthesize_avi_table(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → (id, data) with REAL AVI/MJPEG bytes, generated distributed
    (mapInPandas): video ``i`` has ``2 + i%3`` frames of 16×16 grayscale,
    frame ``f`` built from 2×2 blocks of 8×8 constant pixels
    ``(i*17 + f*11 + by*31 + bx*7) % 256`` at unit quant (the bit-exact
    JPEG round-trip case), muxed at ``5 + i%4`` fps. The closed-form
    block rule survives demux+decode exactly, so a SQL engine can
    recompute every frame's stats — same oracle pattern as the image
    and audio tables."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                frames = []
                for f in range(2 + i % 3):
                    by, bx = np.meshgrid(np.arange(2), np.arange(2), indexing="ij")
                    vals = ((i * 17 + f * 11 + by * 31 + bx * 7) % 256).astype(np.uint8)
                    arr = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                    frames.append(jpeg_codec.encode_jpeg(arr))
                blobs.append(avi_codec.encode_avi_mjpeg(frames, 16, 16, fps=5 + i % 4))
            yield pd.DataFrame({id_col: pdf[id_col], "data": blobs})

    out_schema = T.StructType(
        [
            T.StructField(id_col, ids.schema[id_col].dataType, False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    # the id column is a tiny, often single-split input driving expensive
    # per-row codec work — spread it across the cluster before the fan-out
    # (a round-robin shuffle of just the ids; cost O(ids), win = full
    # parallelism for the codec stage)
    par = ids.sparkSession.sparkContext.defaultParallelism
    return ids.select(id_col).repartition(par).mapInPandas(gen, schema=out_schema)


def video_frame_stats(
    media: DataFrame, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """REAL video frame decode: demux AVI/MJPEG (pure RIFF walker) and
    decode every frame with the pure-numpy JPEG codec, emitting one row
    per (video, frame) with integer pixel stats — the oracle-checkable
    core of a frame featurizer, and the row-explosion shape a real
    frame-sampling pipeline has (one input row fans out to n_frames
    rows inside the same Arrow batch, no JVM explode needed)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType, False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("fps", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("pixel_sum", T.LongType(), False),
            T.StructField("pixel_min", T.LongType(), False),
            T.StructField("pixel_max", T.LongType(), False),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (id_col, "frame_idx", "fps", "height",
                                    "width", "pixel_sum", "pixel_min", "pixel_max")}
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                frames, fps, _ = avi_codec.decode_avi_mjpeg(bytes(data))
                for fi, blob in enumerate(frames):
                    arr = jpeg_codec.decode_jpeg(blob)
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["fps"].append(fps)
                    rows["height"].append(arr.shape[0])
                    rows["width"].append(arr.shape[1])
                    rows["pixel_sum"].append(int(arr.sum(dtype=np.int64)))
                    rows["pixel_min"].append(int(arr.min()))
                    rows["pixel_max"].append(int(arr.max()))
            yield pd.DataFrame(rows)

    return media.select(id_col, data_col).mapInPandas(stats, schema=out_schema)


def image_pixel_stats(
    media: DataFrame, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """Decode images (real PNG path) and emit integer pixel statistics —
    the oracle-checkable core of a featurizer: all outputs are exact
    ints, so the result hash-matches a SQL oracle that knows the pixel
    rule. Same Arrow-batched ``mapInPandas`` shape a CNN featurizer
    uses; decode errors fail the task loudly (never silent nulls)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType, False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("pixel_sum", T.LongType(), False),
            T.StructField("pixel_min", T.LongType(), False),
            T.StructField("pixel_max", T.LongType(), False),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: pdf[id_col], "height": [], "width": [],
                    "pixel_sum": [], "pixel_min": [], "pixel_max": []}
            for data in pdf[data_col]:
                arr = _decode_image_bytes(bytes(data))
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["pixel_sum"].append(int(arr.sum(dtype=np.int64)))
                rows["pixel_min"].append(int(arr.min()))
                rows["pixel_max"].append(int(arr.max()))
            yield pd.DataFrame(rows, index=pdf.index)

    return media.select(id_col, data_col).mapInPandas(stats, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata updated JVM-side; pixel work is the stub
    decode (real impl would re-encode in the same mapInPandas pass).
    For REAL pixel resizing of PNG payloads see :func:`resize_png`."""
    return media.filter(F.col("kind") == "image").withColumns(
        {"width": F.lit(width), "height": F.lit(height)}
    )


def resize_png(
    media: DataFrame, width: int, height: int, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """REAL image resize for PNG payloads: decode (pure codec) →
    nearest-neighbor resample (vectorized numpy index grid:
    ``out[i,j] = src[⌊i·h/H⌋, ⌊j·w/W⌋]``) → re-encode, one Arrow batch
    per Python invocation. Output rows carry the resized PNG bytes plus
    the new dims — the full decode→transform→encode media pipeline
    stage, no image library needed."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType, False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for data in pdf[data_col]:
                src = png_codec.decode_png(bytes(data))
                h, w = src.shape[:2]
                rows = (np.arange(height) * h) // height
                cols = (np.arange(width) * w) // width
                blobs.append(png_codec.encode_png(src[np.ix_(rows, cols)]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "height": np.int32(height),
                    "width": np.int32(width),
                    "data": blobs,
                }
            )

    return media.select(id_col, data_col).mapInPandas(resize, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (media_id, frame_ts_ms) rows; frame decode is stubbed, the
    explode/partition shape is the real thing."""
    frames = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
