"""RIFF/PCM WAV codec: round trips, chunk walking, loud refusals."""

import struct

import numpy as np
import pytest

from kafka_plugins_spark.functions import wav_codec as W


def test_mono_int16_roundtrip_exact():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, size=443).astype(np.int16)
    dec, rate = W.decode_wav(W.encode_wav(s, 16000))
    assert rate == 16000 and dec.shape == (443, 1)
    assert np.array_equal(dec[:, 0], s)


def test_stereo_and_depths_roundtrip():
    rng = np.random.default_rng(9)
    for dtype, lo, hi in ((np.uint8, 0, 256), (np.int16, -32768, 32768),
                          (np.int32, -2**31, 2**31)):
        s = rng.integers(lo, hi, size=(100, 2)).astype(dtype)
        dec, rate = W.decode_wav(W.encode_wav(s, 8000))
        assert rate == 8000 and dec.shape == (100, 2) and dec.dtype == dtype
        assert np.array_equal(dec, s)


def test_odd_data_length_word_alignment():
    # 8-bit mono with odd sample count → odd data chunk, padded per spec
    s = np.arange(33, dtype=np.uint8)
    blob = W.encode_wav(s, 8000)
    dec, _ = W.decode_wav(blob)
    assert np.array_equal(dec[:, 0], s)


def test_extra_chunks_are_skipped():
    s = np.arange(10, dtype=np.int16)
    blob = bytearray(W.encode_wav(s, 44100))
    # splice a LIST chunk between fmt and data
    fmt_end = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    blob2 = bytes(blob[:fmt_end]) + extra + bytes(blob[fmt_end:])
    # fix the RIFF size field
    blob2 = b"RIFF" + struct.pack("<I", len(blob2) - 8) + blob2[8:]
    dec, rate = W.decode_wav(blob2)
    assert rate == 44100 and np.array_equal(dec[:, 0], s)


def test_loud_refusals():
    with pytest.raises(ValueError):
        W.decode_wav(b"OggS" + bytes(40))
    # float PCM (format tag 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    blob = (b"RIFF" + struct.pack("<I", 20 + len(fmt)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError):
        W.decode_wav(blob)
    with pytest.raises(ValueError):
        W.encode_wav(np.zeros(8, dtype=np.float32))


def test_truncated_data_raises():
    s = np.arange(50, dtype=np.int16)
    blob = W.encode_wav(s, 8000)
    with pytest.raises(ValueError):
        W.decode_wav(blob[:-7])
