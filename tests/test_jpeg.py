"""Baseline-JPEG luma decoder, gated by a hand-built spec-conformant
encoder: FDCT + quantize + zigzag + canonical-Huffman entropy coding +
byte stuffing, constructed directly from the JPEG spec (NOT by
inverting the decoder's code), so a shared misreading of the spec on
both sides is limited to the well-known constants (zigzag table, DCT
basis) — which the solid-color and single-coefficient tests pin
independently: a solid block's decode depends only on the DC path, and
its expected pixel value is computable by hand."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tlmc_etl_spark.operators.jpeg import ZIGZAG, _D, parse_jpeg_luma

# ---- encoder -------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# flat tables: all DC size-symbols at length 4, all AC symbols at length 8
FLAT_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
FLAT_DC_SYMBOLS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
FLAT_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8
FLAT_AC_SYMBOLS = _AC_SYMS
# Annex K.3.1 luminance DC table (real variable-length codes)
K3_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K3_DC_SYMBOLS = list(range(12))


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(cls: int, tid: int, counts, symbols) -> bytes:
    return _seg(
        0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
    )


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coeff = _D @ (block - 128.0) @ _D.T
    zz = coeff.reshape(-1)[ZIGZAG]
    return np.round(zz / q).astype(np.int64)


def _mag(v: int):
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(w, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    size, bits = _mag(diff)
    length, code = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            w.write(code, length)
            run -= 16
        size, bits = _mag(v)
        length, code = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        length, code = ac_codes[0x00]
        w.write(code, length)
    return int(zz[0])


def encode_gray_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    dc_counts=FLAT_DC_COUNTS,
    dc_symbols=FLAT_DC_SYMBOLS,
    restart_interval: int = 0,
) -> bytes:
    """Grayscale baseline JPEG (1 component, 8x8 sampling)."""
    h, w = img.shape
    q = np.ones(64) if quant is None else quant.astype(np.float64)
    dc_codes = _canonical_codes(dc_counts, dc_symbols)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )
    out += _dht(0, 0, dc_counts, dc_symbols)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    bw = _BitWriter()
    pred = 0
    padded = np.pad(img.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge")
    mcu = 0
    rst = 0
    for r in range(0, padded.shape[0], 8):
        for c in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = 0
            mcu += 1
            zz = _fdct_quant(padded[r : r + 8, c : c + 8], q)
            pred = _encode_block(bw, zz, pred, dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_420_jpeg(y: np.ndarray, chroma_val: int = 128) -> bytes:
    """YCbCr 4:2:0 baseline JPEG with constant chroma planes — the
    interleave/MCU structure of a real color JPEG (4 Y blocks + Cb +
    Cr per MCU), with the decoder expected to surface exactly `y`."""
    h, w = y.shape
    q = np.ones(64)
    dc_codes = _canonical_codes(FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht(0, 0, FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")
    bw = _BitWriter()
    pad_h, pad_w = -h % 16, -w % 16
    padded = np.pad(y.astype(np.float64), ((0, pad_h), (0, pad_w)), mode="edge")
    preds = {1: 0, 2: 0, 3: 0}
    chroma = np.full((8, 8), float(chroma_val))
    for r in range(0, padded.shape[0], 16):
        for c in range(0, padded.shape[1], 16):
            for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                zz = _fdct_quant(padded[r + by : r + by + 8, c + bx : c + bx + 8], q)
                preds[1] = _encode_block(bw, zz, preds[1], dc_codes, ac_codes)
            for cid in (2, 3):
                zz = _fdct_quant(chroma, q)
                preds[cid] = _encode_block(bw, zz, preds[cid], dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- tests ---------------------------------------------------------------


class TestJpegDecode:
    def test_solid_gray_pins_dc_path_by_hand(self):
        # hand-computable: a solid block's only nonzero coefficient is
        # DC = 8 * (v - 128) (orthonormal FDCT); quant 1 keeps it exact,
        # so the decode must return v everywhere within rounding
        for v in (0, 1, 127, 128, 200, 255):
            img = np.full((16, 24), v, dtype=np.float64)
            dec = parse_jpeg_luma(encode_gray_jpeg(img))
            assert dec.shape == (16, 24)
            assert np.abs(dec - v).max() < 0.75, f"value {v}"

    def test_random_image_roundtrips_near_losslessly(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(24, 32)).astype(np.float64)
        dec = parse_jpeg_luma(encode_gray_jpeg(img))
        # quant 1: each of 64 coefficients rounds by <=0.5; orthonormal
        # IDCT spreads that to a few units per pixel at worst
        assert np.abs(dec - img).max() < 4.0
        assert np.abs(dec - img).mean() < 1.0

    def test_realistic_quant_table_degrades_gracefully(self):
        rng = np.random.default_rng(11)
        base = np.cumsum(rng.normal(0, 4, size=(32, 32)), axis=1) + 128
        img = np.clip(base, 0, 255)
        quant = np.clip(np.arange(64) * 2 + 4, 1, 120).astype(np.float64)
        dec = parse_jpeg_luma(encode_gray_jpeg(img, quant=quant))
        assert np.abs(dec - img).mean() < 12.0

    def test_annex_k_dc_table_decodes_same_pixels(self):
        # real variable-length canonical codes vs the flat 4-bit table:
        # same image, same pixels
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        a = parse_jpeg_luma(encode_gray_jpeg(img))
        b = parse_jpeg_luma(
            encode_gray_jpeg(img, dc_counts=K3_DC_COUNTS, dc_symbols=K3_DC_SYMBOLS)
        )
        assert np.array_equal(a, b)

    def test_420_color_interleave_surfaces_y_plane(self):
        rng = np.random.default_rng(17)
        y = rng.integers(0, 256, size=(32, 48)).astype(np.float64)
        dec = parse_jpeg_luma(encode_420_jpeg(y))
        gray = parse_jpeg_luma(encode_gray_jpeg(y))
        assert dec.shape == (32, 48)
        assert np.array_equal(dec, gray)

    def test_odd_dimensions_crop_exactly(self):
        rng = np.random.default_rng(19)
        img = rng.integers(0, 256, size=(10, 7)).astype(np.float64)
        dec = parse_jpeg_luma(encode_gray_jpeg(img))
        assert dec.shape == (10, 7)
        assert np.abs(dec - img).max() < 4.0

    def test_restart_markers_reset_predictors(self):
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, size=(8, 64)).astype(np.float64)  # 8 MCUs
        plain = parse_jpeg_luma(encode_gray_jpeg(img))
        with_rst = parse_jpeg_luma(encode_gray_jpeg(img, restart_interval=2))
        assert np.array_equal(plain, with_rst)

    def test_progressive_raises(self):
        body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        payload = b"\xff\xd8" + _seg(0xC2, body)
        with pytest.raises(ValueError, match="baseline"):
            parse_jpeg_luma(payload)

    def test_not_jpeg_raises(self):
        with pytest.raises(ValueError, match="not a JPEG"):
            parse_jpeg_luma(b"\x89PNG\r\n\x1a\n")

    def test_dispatch_from_decode_image(self):
        from tlmc_etl_spark.operators.multimodal import decode_payload

        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        v = decode_payload("image", encode_gray_jpeg(img))
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
