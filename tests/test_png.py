"""PNG codec: spec-subset round-trips (all filters, all color types),
loud failures on corruption/unsupported features, and the Spark
image-decode operator over real PNG bytes."""

import struct
import zlib

import numpy as np
import pytest

from kafka_plugins_spark.functions import png_codec


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(13, 17), (8, 9, 3), (5, 6, 4)])
def test_roundtrip_every_filter_and_colortype(filter_type, shape):
    arr = _rand(shape, seed=filter_type * 100 + len(shape))
    back = png_codec.decode_png(png_codec.encode_png(arr, filter_type=filter_type))
    assert back.shape == arr.shape and back.dtype == np.uint8
    assert np.array_equal(back, arr)


def test_one_pixel_and_gradient_images():
    assert np.array_equal(
        png_codec.decode_png(png_codec.encode_png(np.array([[42]], np.uint8))),
        np.array([[42]], np.uint8),
    )
    grad = (np.arange(64 * 64) % 256).astype(np.uint8).reshape(64, 64)
    for ft in range(5):
        assert np.array_equal(png_codec.decode_png(png_codec.encode_png(grad, ft)), grad)


def test_bad_signature_and_crc_raise():
    with pytest.raises(ValueError, match="signature"):
        png_codec.decode_png(b"JFIF not a png at all")
    good = png_codec.encode_png(_rand((4, 4), 1))
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # inside IHDR payload → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        png_codec.decode_png(bytes(corrupted))


def test_unsupported_features_raise_not_decode_wrong():
    # hand-build an IHDR with bit depth 16 / interlace 1
    def ihdr(depth, color, interlace):
        payload = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        return (
            png_codec.PNG_SIGNATURE
            + struct.pack(">I", len(payload))
            + b"IHDR"
            + payload
            + struct.pack(">I", zlib.crc32(b"IHDR" + payload) & 0xFFFFFFFF)
        )

    with pytest.raises(NotImplementedError, match="bit depth"):
        png_codec.decode_png(ihdr(16, 0, 0))
    with pytest.raises(NotImplementedError, match="palette"):
        png_codec.decode_png(ihdr(8, 3, 0))
    with pytest.raises(NotImplementedError, match="interlace"):
        png_codec.decode_png(ihdr(8, 0, 1))


def test_spark_png_decode_operator(spark):
    """Distributed generate → decode round-trip: stats from the decoded
    pixels equal the closed-form rule for every row."""
    from kafka_plugins_spark.operators.multimodal import (
        image_pixel_stats,
        synthesize_png_table,
    )

    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: (r["height"], r["width"], r["pixel_sum"], r["pixel_min"], r["pixel_max"])
        for r in image_pixel_stats(synthesize_png_table(ids), id_col="doc_id").collect()
    }
    assert len(got) == 40
    for i in range(40):
        h, w = 6 + i % 4, 8 + i % 5
        px = (i * 7 + np.arange(h * w)) % 256
        assert got[i] == (h, w, int(px.sum()), int(px.min()), int(px.max()))


def test_decode_image_bytes_dispatch():
    """JPEG bytes now take the REAL pure-numpy baseline decoder (r3
    closed the stub); truncated/garbage JPEG raises loudly instead of
    producing a fake; non-image bytes (audio) keep the documented
    deterministic fake-grid path."""
    import pytest

    from kafka_plugins_spark.functions import jpeg_codec
    from kafka_plugins_spark.operators.multimodal import _decode_image_bytes

    img = ((np.arange(64).reshape(8, 8) * 3) % 256).astype(np.uint8)
    out = _decode_image_bytes(jpeg_codec.encode_jpeg(img))
    assert out.shape == (8, 8) and out.dtype == np.uint8

    with pytest.raises(ValueError):
        _decode_image_bytes(b"\xff\xd8\xff" + bytes(range(97)))

    fake = _decode_image_bytes(b"RIFFWAVE" + bytes(range(95)))
    assert fake.ndim == 2 and fake.dtype == np.uint8


def test_resize_png_nearest_neighbor(spark):
    """Round-trip through the full decode→resample→encode stage: resized
    pixels equal the closed-form nearest-neighbor rule, RGB included."""
    from kafka_plugins_spark.operators.multimodal import resize_png

    rgb = _rand((12, 10, 3), seed=7)
    grey = _rand((9, 14), seed=8)
    import pandas as pd
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [0, 1],
            "data": [png_codec.encode_png(grey), png_codec.encode_png(rgb)],
        }),
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]),
    )
    out = {r["media_id"]: r for r in resize_png(df, width=6, height=4).collect()}
    for mid, src in ((0, grey), (1, rgb)):
        got = png_codec.decode_png(bytes(out[mid]["data"]))
        h, w = src.shape[:2]
        rows = (np.arange(4) * h) // 4
        cols = (np.arange(6) * w) // 6
        assert np.array_equal(got, src[np.ix_(rows, cols)])
        assert (out[mid]["height"], out[mid]["width"]) == (4, 6)
