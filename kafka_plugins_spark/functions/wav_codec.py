"""Pure-Python WAV (RIFF/PCM) codec — no soundfile/librosa needed.

Implements the subset of the public RIFF WAVE format (Microsoft/IBM
multimedia spec, as registered with IANA audio/wav) an audio featurizer
needs: integer PCM at 8/16/32-bit depth, any channel count and sample
rate, chunk-walking parse that tolerates extra chunks (LIST, fact,
cue...). Compressed/float formats (format tag ≠ 1) raise
``NotImplementedError`` loudly rather than decode wrong.

This closes the audio half of the r2 media stub the same way
``png_codec``/``jpeg_codec`` closed the image half: the decode path is
REAL and its integer sample statistics are closed-form oracle-checkable
(``operators/multimodal.synthesize_wav_table``). The reference repo has
no media path; this exists for the LLM-data-pipeline operators.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_SIGNATURE = b"RIFF"

_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM samples → WAV bytes. ``samples`` is (n,) mono or (n, ch);
    dtype must be uint8, int16, or int32 (the PCM container types:
    8-bit WAV is unsigned, wider depths are signed, per the spec)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    depth = samples.dtype.itemsize * 8
    if depth not in _DTYPES or samples.dtype != _DTYPES[depth]:
        raise ValueError(f"unsupported dtype {samples.dtype} (uint8/int16/int32)")
    n, ch = samples.shape
    data = samples.astype("<" + samples.dtype.str[1:]).tobytes()  # little-endian
    block_align = ch * depth // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, depth
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples array (n, ch), sample_rate).

    Integer PCM only; walks chunks so extra metadata chunks between
    ``fmt `` and ``data`` are skipped, as the spec allows. Truncated
    files and non-PCM format tags raise — never a silently wrong decode.
    """
    if data[:4] != WAV_SIGNATURE or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) < length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            tag_fmt, ch, rate, _, _, depth = struct.unpack("<HHIIHH", payload[:16])
            if tag_fmt != 1:
                raise NotImplementedError(
                    f"WAV format tag {tag_fmt} (only integer PCM=1 supported)"
                )
            if depth not in _DTYPES:
                raise NotImplementedError(f"{depth}-bit PCM unsupported (8/16/32)")
            fmt = (ch, rate, depth)
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    ch, rate, depth = fmt
    samples = np.frombuffer(pcm, dtype="<" + np.dtype(_DTYPES[depth]).str[1:])
    if len(samples) % ch:
        raise ValueError("data chunk length not a multiple of the frame size")
    return samples.reshape(-1, ch).astype(_DTYPES[depth]), rate
