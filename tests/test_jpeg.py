"""Baseline JPEG codec: round trips, sampling modes, loud refusals.

Same strategy as test_png.py: the codec must either decode exactly
(block-constant + unit quant — the closed-form-oracle corpus), decode
within a proven error bound (IDCT rounding), or refuse loudly. The
4:2:0 path is exercised with a hand-built entropy stream since the
encoder writes 4:4:4 only.
"""

import struct

import numpy as np
import pytest

from kafka_plugins_spark.functions import jpeg_codec as J


def test_block_constant_gray_roundtrip_exact():
    """Unit quant + per-8x8-block-constant pixels → bit-exact decode.
    This is the property the media_jpeg_decode driver oracle relies on."""
    rng = np.random.default_rng(3)
    for _ in range(15):
        bh, bw = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        vals = rng.integers(0, 256, size=(bh, bw)).astype(np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        dec = J.decode_jpeg(J.encode_jpeg(img))
        assert dec.shape == img.shape
        assert np.array_equal(dec, img)


def test_random_gray_near_lossless_at_unit_quant():
    """Arbitrary pixels at quant=1: the only loss is IDCT float rounding,
    bounded by 1 count — proves Huffman (incl. AC run/size + ZRL), DC
    prediction, zigzag, and dequant are exact end-to-end."""
    rng = np.random.default_rng(7)
    for _ in range(8):
        h, w = int(rng.integers(5, 40)), int(rng.integers(5, 40))
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(img))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_rgb_444_roundtrip_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img))
    assert dec.shape == img.shape
    # color-space double conversion adds a little; still tightly bounded
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_lossy_quant_smooth_image():
    q = np.full(64, 8)
    q[0] = 4
    smooth = (np.add.outer(np.arange(32) * 3, np.arange(48) * 2) % 256).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(smooth, quant=q))
    assert np.abs(dec.astype(int) - smooth.astype(int)).mean() < 12


def test_420_subsampled_decode():
    """Hand-built 4:2:0 stream (2×2 Y, 1 Cb, 1 Cr per MCU, DC-only
    blocks, unit quant): decoder must place the four Y blocks correctly
    and upsample chroma 2×2."""
    h = w = 16
    yvals = [[40, 90], [140, 200]]  # per 8×8 Y block
    cb_v, cr_v = 100, 160

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += struct.pack(">BBB", 1, 0x22, 0)  # Y 2×2
    sof += struct.pack(">BBB", 2, 0x11, 0)
    sof += struct.pack(">BBB", 3, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, bits, vals in [
        (0x00, J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        (0x10, J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        (0x01, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
        (0x11, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ]:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wbits = J._BitWriter()
    dc_l = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_l = J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    dc_c = J._canonical_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
    ac_c = J._canonical_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)

    def put(dc_codes, ac_codes, dc_value, pred):
        diff = dc_value - pred
        s = J._category(diff)
        code, ln = dc_codes[s]
        wbits.write(code, ln)
        if s:
            wbits.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, ln = ac_codes[0x00]  # EOB
        wbits.write(code, ln)
        return dc_value

    # DC coefficient of a constant block at unit quant is 8·(v−128)
    pred_y = 0
    for by in range(2):
        for bx in range(2):
            pred_y = put(dc_l, ac_l, 8 * (yvals[by][bx] - 128), pred_y)
    put(dc_c, ac_c, 8 * (cb_v - 128), 0)
    put(dc_c, ac_c, 8 * (cr_v - 128), 0)
    out += wbits.flush() + b"\xff\xd9"

    dec = J.decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3)

    y = np.repeat(np.repeat(np.array(yvals, float), 8, 0), 8, 1)
    cb = np.full((16, 16), float(cb_v))
    cr = np.full((16, 16), float(cr_v))
    r = np.round(y + 1.402 * (cr - 128)).clip(0, 255)
    g = np.round(y - 0.344136286 * (cb - 128) - 0.714136286 * (cr - 128)).clip(0, 255)
    b = np.round(y + 1.772 * (cb - 128)).clip(0, 255)
    want = np.stack([r, g, b], -1).astype(np.uint8)
    assert np.array_equal(dec, want)


def test_loud_refusals():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01")
    # progressive SOF2
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x06\x08\x00\x08\x00")
    # restart interval
    dri = b"\xff\xd8\xff\xdd\x00\x04\x00\x08"
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(dri + b"\xff\xd9")


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: any run of 0xFF fill bytes may pad before a marker
    code; the parser must skip them, not read 0xFF as the code."""
    rng = np.random.default_rng(11)
    img = np.repeat(np.repeat(rng.integers(0, 256, size=(2, 3)).astype(np.uint8), 8, 0), 8, 1)
    enc = J.encode_jpeg(img)
    i = enc.index(b"\xff\xc0")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    assert np.array_equal(J.decode_jpeg(padded), J.decode_jpeg(enc))


def test_undefined_huffman_table_raises_value_error():
    """A scan referencing a DHT slot that was never defined must refuse
    with a clear ValueError, not a bare KeyError."""
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(J.encode_jpeg(img))
    out = bytearray()
    pos = 0
    while pos < len(enc):
        if enc[pos] == 0xFF and pos + 1 < len(enc) and enc[pos + 1] == 0xC4:
            (seglen,) = struct.unpack(">H", enc[pos + 2 : pos + 4])
            pos += 2 + seglen  # drop the DHT segment entirely
        else:
            out.append(enc[pos])
            pos += 1
    with pytest.raises(ValueError, match="Huffman"):
        J.decode_jpeg(bytes(out))
