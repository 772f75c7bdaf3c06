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

from tlmc_etl_spark.operators.jpeg import (
    K3_DC_COUNTS,
    K3_DC_SYMBOLS,
    _seg,
    encode_420_jpeg,
    encode_gray_jpeg,
    parse_jpeg_luma,
)

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
