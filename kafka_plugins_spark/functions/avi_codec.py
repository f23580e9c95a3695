"""Pure-Python AVI (RIFF) MJPEG demuxer/muxer — no ffmpeg needed.

Implements the subset of the public AVI RIFF container format
(Microsoft multimedia spec: 'AVI ' form with hdrl/movi lists, 00dc
video chunks) a frame-sampling pipeline needs, for Motion-JPEG video —
each frame is a standalone baseline JPEG decodable by
:mod:`kafka_plugins_spark.functions.jpeg_codec`. Together they make the
video path REAL end-to-end: demux → per-frame decode → stats, with no
codec libraries. Non-MJPEG streams, audio streams, and missing headers
raise loudly rather than demux wrong.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (kept for symmetry with sibling codecs)

AVI_SIGNATURE = b"RIFF"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) % 2 else b"")


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame blobs → AVI bytes (one 'vids'/'MJPG' stream + idx1)."""
    if not frames:
        raise ValueError("need at least one frame")
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_size,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_size, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the start of 'movi'
    idx_entries = []
    off = 4  # past the 'movi' list-type fourcc
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[list[bytes], int, tuple[int, int]]:
    """AVI bytes → (list of JPEG frame blobs, fps, (width, height)).

    Walks the RIFF tree; requires exactly one 'vids' stream with MJPG
    (or the equivalent 'dmb1') handler. Extra chunks/lists (JUNK, INFO,
    audio-less paddings) are skipped per the container spec.
    """
    if data[:4] != AVI_SIGNATURE or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI header)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if 8 + riff_size > len(data):
        raise ValueError("truncated RIFF (size field exceeds available bytes)")

    frames: list[bytes] = []
    fps = 0
    dims = (0, 0)
    vids_seen = 0
    handler_ok = False

    def walk(start: int, end: int) -> None:
        nonlocal fps, dims, vids_seen, handler_ok
        pos = start
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            payload_end = pos + 8 + length
            if payload_end > end:
                raise ValueError(f"truncated {tag!r} chunk")
            if tag == b"LIST":
                walk(pos + 12, payload_end)
            elif tag == b"strh":
                fcc_type = data[pos + 8 : pos + 12]
                fcc_handler = data[pos + 12 : pos + 16]
                if fcc_type == b"vids":
                    vids_seen += 1
                    if fcc_handler not in (b"MJPG", b"mjpg", b"dmb1"):
                        raise NotImplementedError(
                            f"video handler {fcc_handler!r} (MJPG only)"
                        )
                    handler_ok = True
                    scale, rate = struct.unpack("<II", data[pos + 28 : pos + 36])
                    fps = rate // scale if scale else 0
                elif fcc_type == b"auds":
                    raise NotImplementedError("audio streams unsupported (demux video-only AVIs)")
            elif tag == b"strf" and dims == (0, 0) and length >= 12:
                w, h = struct.unpack("<ii", data[pos + 12 : pos + 20])
                dims = (w, abs(h))
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(data[pos + 8 : payload_end])
            pos = payload_end + (length % 2)

    walk(12, 8 + riff_size)
    if vids_seen != 1 or not handler_ok:
        raise ValueError(f"expected exactly one MJPG vids stream, saw {vids_seen}")
    if not frames:
        raise ValueError("no video frames in movi list")
    return frames, fps, dims
