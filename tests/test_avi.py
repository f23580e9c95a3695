"""AVI/MJPEG container: mux/demux round trips, header fields, refusals."""

import struct

import numpy as np
import pytest

from kafka_plugins_spark.functions import avi_codec as A
from kafka_plugins_spark.functions import jpeg_codec as J


def _gray_frame(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return J.encode_jpeg(rng.integers(0, 256, size=(16, 16)).astype(np.uint8))


def test_mux_demux_roundtrip_byte_exact():
    frames = [_gray_frame(i) for i in range(5)]
    blob = A.encode_avi_mjpeg(frames, 16, 16, fps=12)
    out, fps, dims = A.decode_avi_mjpeg(blob)
    assert fps == 12 and dims == (16, 16)
    assert out == frames  # demux returns the exact JPEG payloads


def test_odd_length_frames_word_aligned():
    # force an odd-length payload; the 'dc' chunk must pad, demux must strip
    frames = [b"\xff\xd8" + b"x" * 7 + b"\xff\xd9"]
    out, _, _ = A.decode_avi_mjpeg(A.encode_avi_mjpeg(frames, 4, 4))
    assert out == frames


def test_frames_decode_through_jpeg_codec():
    imgs = [
        np.repeat(np.repeat(np.array([[v, v + 3], [v + 5, v + 7]], dtype=np.uint8), 8, 0), 8, 1)
        for v in (10, 80, 200)
    ]
    blob = A.encode_avi_mjpeg([J.encode_jpeg(im) for im in imgs], 16, 16, fps=5)
    out, _, _ = A.decode_avi_mjpeg(blob)
    for im, fr in zip(imgs, out):
        assert np.array_equal(J.decode_jpeg(fr), im)  # block-constant ⇒ exact


def test_loud_refusals():
    with pytest.raises(ValueError):
        A.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        A.encode_avi_mjpeg([], 4, 4)
    # non-MJPG handler
    blob = bytearray(A.encode_avi_mjpeg([_gray_frame(0)], 16, 16))
    i = blob.index(b"vids") + 4
    blob[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        A.decode_avi_mjpeg(bytes(blob))


def test_truncated_raises():
    blob = A.encode_avi_mjpeg([_gray_frame(1)], 16, 16)
    # cut inside the movi list but keep the RIFF size field claiming more
    with pytest.raises(ValueError):
        A.decode_avi_mjpeg(blob[:-10])
