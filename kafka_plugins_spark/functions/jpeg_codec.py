"""Pure-numpy baseline JPEG codec — no PIL/libjpeg needed.

Implements the subset of the public JPEG spec (ITU-T T.81 / ISO 10918-1,
baseline sequential DCT, Huffman entropy coding) a training-data
pipeline's image featurizer needs:

- decode: SOF0 baseline, 8-bit, grayscale / 3-component YCbCr at 4:4:4
  or 4:2:0 sampling, standard or custom DQT/DHT tables. Progressive
  (SOF2), 12-bit precision, arithmetic coding, and restart intervals
  raise ``NotImplementedError`` loudly rather than decode wrong.
- encode: grayscale or RGB (written 4:4:4), one quant table per
  luma/chroma, the spec's Annex K example Huffman tables.

The decode pipeline is the classical one: marker parse → Huffman decode
(DC diff + AC run/size) → dequantize → de-zigzag → 8×8 IDCT (matrix
form, one ``einsum`` per component over ALL blocks at once) → level
shift → chroma upsample → YCbCr→RGB. Everything after entropy decode is
vectorized numpy; the entropy loop is per-symbol Python over plain ints
(the honest price of a no-library sandbox — swap in libjpeg on a real
cluster).

Reference parity note: the reference repo has no media path at all; this
module exists for the LLM-data-pipeline multimodal operators
(``operators/multimodal.py``), same as ``png_codec``.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants from the public spec ---------------------------------------

# zig-zag scan order: ZIGZAG[k] = (row, col) flattened index of the k-th
# coefficient in scan order (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 example Huffman tables (the de-facto standard ones)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_mat() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: C[k,n] = a(k)·cos((2n+1)kπ/16)."""
    n = np.arange(8)
    c = 0.5 * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


_C = _dct_mat()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(bits, huffval) → {symbol: (code, length)} (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_FAST_TABLE_CACHE: dict[tuple[bytes, bytes], list] = {}


def _decode_table(bits: list[int], vals: list[int]) -> list:
    """(bits, huffval) → flat 2^16 lookup table: ``table[peek16]`` =
    ``(symbol, code_length)``. One table lookup decodes a whole symbol
    instead of walking the code bit by bit (~10× on the entropy loop,
    the decoder's hot path). Built once per distinct table per process —
    real corpora reuse the Annex K tables, so the 64 Ki build cost
    amortizes across every image."""
    key = (bytes(bits), bytes(vals))
    cached = _FAST_TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    table: list = [None] * 65536
    for sym, (code, ln) in _canonical_codes(bits, vals).items():
        base = code << (16 - ln)
        entry = (sym, ln)
        for i in range(1 << (16 - ln)):
            table[base + i] = entry
    _FAST_TABLE_CACHE[key] = table
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over the entropy-coded segment with un-stuffing.

    At the end of the segment (the next marker, or end of data) it
    serves virtual 1-padding — the spec's fill bits — so a 16-bit peek
    near the last symbol works; consuming more than 2 virtual bytes
    means the entropy data was truncated, checked in ``assert_drained``.
    """

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.virtual_bytes = 0

    def _fill(self) -> None:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return
                if 0xD0 <= nxt <= 0xD7:
                    raise NotImplementedError("restart markers (DRI/RSTn) unsupported")
                # marker = end of entropy data → fall through to padding
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        self.virtual_bytes += 1
        self.acc = (self.acc << 8) | 0xFF
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: list) -> int:
        while self.nbits < 16:
            self._fill()
        entry = table[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if entry is None:
            raise ValueError("invalid Huffman code")
        sym, ln = entry
        self.nbits -= ln
        self.acc &= (1 << self.nbits) - 1
        return sym

    def assert_drained(self) -> None:
        # ≤2 virtual bytes can be consumed by the final peek16; more
        # means symbols were decoded from padding → truncated stream
        if self.virtual_bytes > 2:
            raise ValueError("entropy data truncated (decoded into padding)")


def _extend(v: int, s: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): s-bit magnitude → signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- encoder ---------------------------------------------------------------


def _encode_blocks(
    blocks: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    writer: _BitWriter,
    pred: int,
) -> int:
    """Entropy-encode quantized coefficient blocks (n, 64) in zigzag order."""
    for zz in blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = _category(diff)
        code, ln = dc_codes[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last = np.nonzero(zz[1:])[0]
        end = (last[-1] + 2) if len(last) else 1
        for k in range(1, end):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if end < 64:
            code, ln = ac_codes[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _quantized_zigzag(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Level-shifted plane → (n_blocks, 64) quantized zigzag coeffs.
    Blocks scan row-major. Plane dims must be multiples of 8."""
    h, w = plane.shape
    blocks = (
        plane.astype(np.float64)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128.0
    coefs = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.round(coefs / quant.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB→YCbCr, float64 (caller rounds)."""
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def encode_jpeg(arr: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes.

    RGB is written as YCbCr 4:4:4 (no subsampling). ``quant`` is a
    64-length (zigzag-order-free, row-major 8×8) table applied to every
    component; defaults to all-ones — near-lossless, and EXACTLY lossless
    for images constant within each 8×8 block (the property the
    closed-form driver oracle relies on, see
    ``operators/multimodal.synthesize_jpeg_table``).
    """
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    if quant is None:
        quant = np.ones(64, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]

    if gray:
        planes = [_pad_to_8(arr)]
    else:
        ycc = np.round(rgb_to_ycbcr(arr)).clip(0, 255).astype(np.uint8)
        planes = [_pad_to_8(ycc[..., i]) for i in range(3)]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0, zigzag order on the wire)
    dqt = bytes([0x00]) + bytes(int(quant[z]) for z in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # H=V=1, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT — luma tables for comp 1, chroma tables for comps 2..3
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in tables:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded data: 4:4:4 ⇒ MCU = one block per component,
    # interleaved in component order, blocks row-major
    zz = [_quantized_zigzag(p, quant) for p in planes]
    dc_l, ac_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS), _canonical_codes(
        AC_LUMA_BITS, AC_LUMA_VALS
    )
    dc_c, ac_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS), _canonical_codes(
        AC_CHROMA_BITS, AC_CHROMA_VALS
    )
    writer = _BitWriter()
    preds = [0] * ncomp
    for b in range(zz[0].shape[0]):
        for c in range(ncomp):
            dc, ac = (dc_l, ac_l) if c == 0 else (dc_c, ac_c)
            preds[c] = _encode_blocks(zz[c][b : b + 1], dc, ac, writer, preds[c])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------

JPEG_SIGNATURE = b"\xff\xd8"


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (h, w) grayscale or (h, w, 3) RGB.

    Supports SOF0 baseline sequential, 8-bit, 1 component or 3-component
    YCbCr at uniform sampling (4:4:4) or 2×2/1×1/1×1 (4:2:0). Loud
    ``NotImplementedError`` for progressive/arithmetic/12-bit/restart
    intervals — never a silently wrong decode.
    """
    if data[:2] != JPEG_SIGNATURE:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    scan = None  # ([(comp_idx, td, ta)], data_start)

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker code — skip them instead of reading 0xFF as the code
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated stream: 0xFF fill run reaches end of data")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack(">H", seg[:2])
            if interval != 0:
                raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scomps.append((cs, tdta >> 4, tdta & 0x0F))
            scan = (scomps, pos + seglen)
            break
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    scomps, dstart = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    samplings = sorted({(c[1], c[2]) for c in comps})
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"{len(comps)} components unsupported")
    if len(comps) == 3 and not (
        samplings == [(1, 1)] or samplings == [(1, 1), (2, 2)]
    ):
        raise NotImplementedError(f"sampling {samplings} unsupported (4:4:4/4:2:0 only)")

    for cs, td, ta in scomps:
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError(
                f"scan component {cs} references undefined Huffman table "
                f"(dc={td} defined={sorted(huff_dc)}, ac={ta} defined={sorted(huff_ac)})"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    order = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    reader = _BitReader(data, dstart)
    preds = {cs: 0 for cs, _, _ in scomps}
    blocks: dict[int, np.ndarray] = {}
    for cs, _, _ in scomps:
        hi, vi, _ = order[cs]
        blocks[cs] = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)

    for my in range(mcuy):
        for mx in range(mcux):
            for cs, td, ta in scomps:
                hi, vi, _ = order[cs]
                dct, act = huff_dc[td], huff_ac[ta]
                for v in range(vi):
                    for u in range(hi):
                        zz = [0] * 64  # plain ints: ~3× less overhead
                        s = reader.huff(dct)
                        diff = _extend(reader.bits(s), s) if s else 0
                        preds[cs] += diff
                        zz[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        blocks[cs][my * vi + v, mx * hi + u] = zz
    reader.assert_drained()

    # dequant + de-zigzag + IDCT, all blocks of a component at once
    planes = []
    for cid, hi, vi, tq in comps:
        zz = blocks[cid].reshape(-1, 64) * quant[tq][ZIGZAG]
        coefs = np.zeros((zz.shape[0], 64), dtype=np.float64)
        coefs[:, ZIGZAG] = zz
        coefs = coefs.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _C, coefs, _C) + 128.0
        by, bx = mcuy * vi, mcux * hi
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        if vi != vmax or hi != hmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.round(planes[0]).clip(0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.round(np.stack([r, g, b], axis=-1)).clip(0, 255).astype(np.uint8)
