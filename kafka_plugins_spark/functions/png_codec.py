"""Pure-Python PNG codec (stdlib zlib + numpy) — no PIL/libvips needed.

Implements the subset of the PNG spec (W3C PNG, second edition —
https://www.w3.org/TR/PNG/) a training-data pipeline's image featurizer
needs: 8-bit greyscale / RGB / RGBA, all five scanline filters
(None/Sub/Up/Average/Paeth), CRC-checked chunks, non-interlaced. The
point is a REAL decode path inside the ``mapInPandas`` featurizer
(``operators/multimodal.py``) that round-trips byte-for-byte and is
oracle-checkable — Adam7 interlace and palette images raise
``NotImplementedError`` loudly rather than decode wrong.

This replaces the round-2 stub for the PNG case; JPEG/audio remain
documented stubs (their codecs need real libraries).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left)."""
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes.

    ``filter_type`` applies one filter to every scanline (0-4) — useful
    for exercising every decoder unfilter path in round-trip tests; real
    encoders pick per-row, which the decoder handles either way.
    """
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 pixels")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    raw = arr.reshape(h, w * channels)
    bpp = channels

    lines = []
    prior = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        row = raw[y]
        left = np.zeros_like(row)
        left[bpp:] = row[:-bpp]
        prior_left = np.zeros_like(prior)
        prior_left[bpp:] = prior[:-bpp]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prior).astype(np.uint8)
        elif filter_type == 3:  # Average
            avg = (left.astype(np.int16) + prior.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth
            filt = (row.astype(np.int16) - _paeth(left, prior, prior_left)).astype(np.uint8)
        lines.append(bytes([filter_type]) + filt.tobytes())
        prior = row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for greyscale, (h, w, c) otherwise.

    Supports bit depth 8, color types 0/2/4/6, filters 0-4,
    non-interlaced. CRC mismatches and unsupported features raise —
    never a silently wrong decode.
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"color type {color_type} (palette unsupported)")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace unsupported")
    if compression != 0 or filter_method != 0:
        raise ValueError("nonstandard compression/filter method")

    channels = _CHANNELS[color_type]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")

    bpp = channels
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        ftype = raw[y * (stride + 1)]
        if ftype == 0:
            recon = line.copy()
        elif ftype == 2:  # Up — fully vectorized
            recon = line + prior  # uint8 wraps mod 256, per spec
        elif ftype == 1:
            # Sub recursion recon[i] = line[i] + recon[i-bpp] unrolls to a
            # per-channel-lane prefix sum mod 256 — fully vectorized
            recon = np.empty(stride, dtype=np.uint8)
            for c in range(bpp):
                lane = line[c::bpp].astype(np.int64)
                recon[c::bpp] = (np.cumsum(lane) & 0xFF).astype(np.uint8)
        elif ftype in (3, 4):
            # Average/Paeth recurse on the just-reconstructed left pixel
            # through a nonlinear predictor — inherently sequential in
            # the pixel axis. Run the chain over plain Python ints
            # (lists), not numpy scalar indexing (~8× faster); the loop
            # is rows-of-one-image only — Arrow batches keep whole
            # images per task, so this never crosses rows.
            ln, pr = line.tolist(), prior.tolist()
            rec = [0] * stride
            if ftype == 3:
                for i in range(bpp):
                    rec[i] = (ln[i] + (pr[i] >> 1)) & 0xFF
                for i in range(bpp, stride):
                    rec[i] = (ln[i] + ((rec[i - bpp] + pr[i]) >> 1)) & 0xFF
            else:
                for i in range(bpp):
                    rec[i] = (ln[i] + pr[i]) & 0xFF  # Paeth(0, up, 0) = up
                for i in range(bpp, stride):
                    left, up, up_left = rec[i - bpp], pr[i], pr[i - bpp]
                    p = left + up - up_left
                    pa = p - left if p >= left else left - p
                    pb = p - up if p >= up else up - p
                    pc = p - up_left if p >= up_left else up_left - p
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else up_left)
                    rec[i] = (ln[i] + pred) & 0xFF
            recon = np.array(rec, dtype=np.uint8)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = recon
        prior = recon
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)
