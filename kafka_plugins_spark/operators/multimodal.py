"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators (one Python invocation per batch, never per
row). The actual codec step is STUBBED — the sandbox image has no
image/audio libraries — behind ``try: import PIL`` with a deterministic
fake so the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and tested; swap ``_decode_image_bytes`` for a real
decoder on a cluster with the libs installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """STUB decode. Real path: PIL.Image.open(io.BytesIO(data)) →
    np.asarray. Deterministic fake: bytes → uint8 grid."""
    try:  # pragma: no cover - PIL absent in the sandbox image
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode is intentionally not wired in the sandbox; "
            "replace _decode_image_bytes when PIL/libvips is available"
        )
    except ImportError:
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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata updated JVM-side; pixel work is the stub
    decode (real impl would re-encode in the same mapInPandas pass)."""
    return media.filter(F.col("kind") == "image").withColumns(
        {"width": F.lit(width), "height": F.lit(height)}
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (media_id, frame_ts_ms) rows; frame decode is stubbed, the
    explode/partition shape is the real thing."""
    frames = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
