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

    def test_progressive_without_scans_raises(self):
        body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        payload = b"\xff\xd8" + _seg(0xC2, body) + b"\xff\xd9"
        with pytest.raises(ValueError, match="no scan data"):
            parse_jpeg_luma(payload)

    def test_lossless_sof_still_raises(self):
        body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        payload = b"\xff\xd8" + _seg(0xC3, body)
        with pytest.raises(ValueError, match="SOF3"):
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


class TestSpecEdgeCases:
    def test_fill_bytes_before_markers_are_skipped(self):
        # spec B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — inject padding before every segment marker
        rng = np.random.default_rng(37)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        payload = encode_gray_jpeg(img)
        plain = parse_jpeg_luma(payload)
        padded = bytearray()
        i = 0
        while i < len(payload):
            if (
                payload[i] == 0xFF
                and i + 1 < len(payload)
                and payload[i + 1] in (0xDB, 0xC0, 0xC4, 0xDA)
            ):
                padded += b"\xff\xff"  # two fill bytes, then the marker
            padded.append(payload[i])
            i += 1
        assert np.array_equal(parse_jpeg_luma(bytes(padded)), plain)

    def test_truncation_anywhere_raises_valueerror(self):
        # the must-error-never-fake contract holds at EVERY cut point:
        # inside a segment header, inside the entropy stream, at the tail
        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        payload = encode_gray_jpeg(img)
        for cut in range(2, len(payload) - 1, 7):
            try:
                parse_jpeg_luma(payload[:cut])
            except ValueError:
                pass  # the contract
            except Exception as e:
                raise AssertionError(
                    f"cut at {cut}: {type(e).__name__} leaked: {e}"
                )
            # a clean decode of a prefix is acceptable only when the cut
            # is past the entropy data (trailing-marker truncation)

    def test_multi_scan_noninterleaved_returns_luma(self):
        # a 3-component baseline file encoded one scan per component:
        # single-component scans use non-interleaved geometry (one block
        # per MCU) and the decoder returns after the Y scan
        rng = np.random.default_rng(43)
        img = rng.integers(0, 256, size=(16, 24)).astype(np.float64)
        q = np.ones(64)
        from tlmc_etl_spark.operators.jpeg import (
            FLAT_AC_COUNTS,
            FLAT_AC_SYMBOLS,
            FLAT_DC_COUNTS,
            FLAT_DC_SYMBOLS,
            _BitWriter,
            _canonical_codes,
            _dht,
            _encode_block,
            _fdct_quant,
        )

        dc_codes = _canonical_codes(FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
        ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
        out = bytearray(b"\xff\xd8")
        out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
        out += _seg(
            0xC0,
            bytes([8])
            + struct.pack(">HH", 16, 24)
            + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        out += _dht(0, 0, FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
        out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
        out += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")  # Y-only scan
        bw = _BitWriter()
        pred = 0
        for r in range(0, 16, 8):
            for c in range(0, 24, 8):
                pred = _encode_block(
                    bw, _fdct_quant(img[r : r + 8, c : c + 8], q), pred,
                    dc_codes, ac_codes,
                )
        bw.flush()
        out += bw.out
        # chroma scans would follow here; the decoder must return after
        # the Y scan without ever parsing them
        out += b"\xff\xd9"
        dec = parse_jpeg_luma(bytes(out))
        assert dec.shape == (16, 24)
        assert np.abs(dec - img).max() < 4.0

    def test_partial_interleaved_scan_raises(self):
        body = (
            bytes([8])
            + struct.pack(">HH", 8, 8)
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
        )
        payload = (
            b"\xff\xd8"
            + _seg(0xC0, body)
            + _seg(0xDA, bytes([2, 1, 0x00, 2, 0x00]) + b"\x00\x3f\x00")
        )
        with pytest.raises(ValueError, match="partial interleaved"):
            parse_jpeg_luma(payload)

    def test_subsampled_grayscale_declaration_ignored(self):
        # a 1-component frame declaring hv=0x22: per spec the single-
        # component scan is non-interleaved and sampling factors don't
        # change the block grid — pixels must equal the hv=0x11 form
        # (the old interleaved path would have decoded 4 blocks per MCU
        # and misplaced everything)
        rng = np.random.default_rng(47)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        plain = parse_jpeg_luma(encode_gray_jpeg(img))
        sub = parse_jpeg_luma(encode_gray_jpeg(img, sampling=0x22))
        assert np.array_equal(plain, sub)


class TestProgressiveDecode:
    """SOF2 progressive decode, gated by a spec-built progressive encoder
    (Annex G scan scripts, EOB runs, successive-approximation refinement)
    — same encoder-independence argument as the baseline harness. The
    load-bearing check everywhere: progressive decode must equal the
    BASELINE decode of the same image bit-for-bit, since both pipelines
    share only the quantized coefficients."""

    def _gray_pair(self, img, quant=None, scans=None):
        from tlmc_etl_spark.operators.jpeg import encode_gray_progressive

        kw = {} if scans is None else {"scans": scans}
        base = parse_jpeg_luma(encode_gray_jpeg(img, quant=quant))
        prog = parse_jpeg_luma(
            encode_gray_progressive(img, quant=quant, **kw)
        )
        return base, prog

    def test_default_script_equals_baseline(self):
        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, size=(40, 33)).astype(np.float64)
        base, prog = self._gray_pair(img)
        assert np.array_equal(base, prog)

    def test_realistic_quant_exercises_refinement_history(self):
        # non-trivial quant → coefficients of many magnitudes → the
        # refinement scans carry real correction bits, not just signs
        rng = np.random.default_rng(43)
        img = rng.integers(0, 256, size=(48, 48)).astype(np.float64)
        quant = np.clip(np.arange(64) * 2 + 4, 1, 120).astype(np.float64)
        base, prog = self._gray_pair(img, quant=quant)
        assert np.array_equal(base, prog)

    def test_deep_successive_approximation(self):
        rng = np.random.default_rng(47)
        img = rng.integers(0, 256, size=(24, 24)).astype(np.float64)
        scans = (
            (0, 0, 0, 3), (1, 63, 0, 3),
            (1, 63, 3, 2), (0, 0, 3, 2),
            (1, 63, 2, 1), (0, 0, 2, 1),
            (1, 63, 1, 0), (0, 0, 1, 0),
        )
        base, prog = self._gray_pair(img, scans=scans)
        assert np.array_equal(base, prog)

    def test_fine_spectral_bands(self):
        rng = np.random.default_rng(53)
        img = rng.integers(0, 256, size=(16, 56)).astype(np.float64)
        scans = (
            (0, 0, 0, 0),
            (1, 1, 0, 0), (2, 4, 0, 0), (5, 12, 0, 0),
            (13, 35, 0, 0), (36, 63, 0, 0),
        )
        base, prog = self._gray_pair(img, scans=scans)
        assert np.array_equal(base, prog)

    def test_long_eob_runs_on_smooth_image(self):
        # heavy quant on a smooth gradient zeroes most AC → EOBn symbols
        # with multi-bit run counts span many blocks
        img = np.tile(np.linspace(40, 200, 64), (64, 1))
        quant = np.full(64, 60.0)
        quant[0] = 8.0
        base, prog = self._gray_pair(img, quant=quant)
        assert np.array_equal(base, prog)

    def test_color_420_interleaved_dc_and_chroma_skip(self):
        from tlmc_etl_spark.operators.jpeg import encode_420_progressive

        rng = np.random.default_rng(59)
        for shape in [(32, 32), (24, 40), (20, 18)]:
            img = rng.integers(0, 256, size=shape).astype(np.float64)
            base = parse_jpeg_luma(encode_420_jpeg(img))
            prog = parse_jpeg_luma(encode_420_progressive(img))
            assert np.array_equal(base, prog), shape

    def test_truncated_progressive_raises(self):
        from tlmc_etl_spark.operators.jpeg import encode_gray_progressive

        rng = np.random.default_rng(61)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        payload = encode_gray_progressive(img)
        for cut in (len(payload) // 3, len(payload) // 2, len(payload) - 3):
            with pytest.raises(ValueError):
                parse_jpeg_luma(payload[:cut])

    def test_dc_only_script_gives_block_means(self):
        # solid-gray: DC-only progression reconstructs the exact value,
        # pinning the Al shift arithmetic by hand (value 100 -> DC
        # -28*8 = -224; Al=1 first pass stores -112<<1 = -224 exactly)
        from tlmc_etl_spark.operators.jpeg import encode_gray_progressive

        img = np.full((16, 16), 100.0)
        payload = encode_gray_progressive(
            img, scans=((0, 0, 0, 1), (0, 0, 1, 0))
        )
        dec = parse_jpeg_luma(payload)
        assert np.abs(dec - 100.0).max() < 1e-9

    def test_dispatch_progressive_through_decode_image(self):
        from tlmc_etl_spark.operators.jpeg import encode_gray_progressive
        from tlmc_etl_spark.operators.multimodal import decode_payload

        rng = np.random.default_rng(67)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        v = decode_payload("image", encode_gray_progressive(img))
        assert v is not None

    def test_refinement_history_deep_in_zero_run(self):
        """Regression: a history coefficient sitting >15 zeros into a run,
        followed by a newly-significant coefficient, must keep the ZRL /
        correction-bit interleave aligned (spec G.1.2.3: pending ZRLs
        flush at every nonzero, so no history bit lands beyond the
        decoder's 16-zero advance window). The block is crafted in DCT
        domain to pin the coefficient pattern exactly."""
        from tlmc_etl_spark.operators.jpeg import (
            _D,
            ZIGZAG,
            encode_gray_progressive,
        )

        zz = np.zeros(64)
        zz[17] = 4.0   # history (|4|>>1 = 2 lands in the Al=1 first pass)
        zz[23] = 1.0   # newly significant only at the Al=0 refinement
        zz[40] = -3.0  # negative history deep in a later run
        zz[55] = 1.0   # another late new-significant
        m = np.zeros(64)
        m[ZIGZAG] = zz
        img = _D.T @ m.reshape(8, 8) @ _D + 128.0
        scans = ((0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0))
        dec = parse_jpeg_luma(encode_gray_progressive(img, scans=scans))
        base = parse_jpeg_luma(encode_gray_jpeg(img))
        assert np.array_equal(dec, base)

    def test_refinement_fuzz_sparse_blocks(self):
        """Sparse random coefficient blocks (the regime where long zero
        runs, EOB runs, history and new-significant coefficients all
        interleave) — 60 seeds, progressive must equal baseline decode."""
        from tlmc_etl_spark.operators.jpeg import (
            _D,
            ZIGZAG,
            encode_gray_progressive,
        )

        rng = np.random.default_rng(97)
        scans = (
            (0, 0, 0, 2), (1, 63, 0, 2),
            (1, 63, 2, 1), (0, 0, 2, 1),
            (1, 63, 1, 0), (0, 0, 1, 0),
        )
        for trial in range(60):
            zz = np.zeros(64)
            n_nz = rng.integers(1, 7)
            pos = rng.choice(np.arange(1, 64), size=n_nz, replace=False)
            zz[pos] = rng.integers(-6, 7, size=n_nz)
            m = np.zeros(64)
            m[ZIGZAG] = zz
            img = _D.T @ m.reshape(8, 8) @ _D + 128.0
            dec = parse_jpeg_luma(encode_gray_progressive(img, scans=scans))
            base = parse_jpeg_luma(encode_gray_jpeg(img))
            assert np.array_equal(dec, base), f"trial {trial}: zz={zz[pos]} at {pos}"


class TestRefinementStrictness:
    """Torn-bitstream contract: a refinement scan whose newly-significant
    coefficient's zero-run overflows the band end must raise, mirroring
    the AC first-scan 'AC index out of band' check (spec G.1.2.3 — a
    conformant encoder can never emit a run that passes se)."""

    @staticmethod
    def _run_refine(run_len: int):
        import numpy as np

        from tlmc_etl_spark.operators.jpeg import _Huff, _prog_ac_scan

        # one-symbol table: (run_len<<4)|1 encoded as the single bit '0'
        counts = [1] + [0] * 15
        huff = _Huff(counts, bytes([(run_len << 4) | 1]))
        # bit 0 (huff code) + sign bit 1, padded, then EOI so the
        # trailing _next_marker finds a marker
        payload = bytes([0b01111111, 0xFF, 0xD9])
        coef = np.zeros((1, 64), dtype=np.int64)
        _prog_ac_scan(
            payload, 0, huff, 1, 5, 1, 0, 0, coef, 1, 1, 1
        )
        return coef

    def test_in_band_run_places_coefficient(self):
        coef = self._run_refine(4)  # skips k=1..4, lands at k=5 == se
        assert coef[0, 5] == 1

    def test_overflowing_run_raises(self):
        import pytest

        with pytest.raises(ValueError, match="out of band"):
            self._run_refine(5)  # skips k=1..5, lands at k=6 > se


class TestColorDecode:
    """parse_jpeg_rgb: full chroma reconstruction for baseline colour
    (dequant + IDCT per component, chroma upsample, JFIF YCbCr->RGB)."""

    @staticmethod
    def _want(rgb):
        from tlmc_etl_spark.operators.jpeg import rgb_to_ycbcr, ycbcr_to_rgb

        ycc = rgb_to_ycbcr(rgb)
        return ycbcr_to_rgb(ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2])

    def _mosaic(self, seed):
        rng = np.random.default_rng(seed)
        rgb = np.zeros((32, 32, 3))
        cols = rng.integers(0, 256, (2, 2, 3)).astype(np.float64)
        for i in range(2):
            for j in range(2):
                rgb[i * 16 : (i + 1) * 16, j * 16 : (j + 1) * 16] = cols[i, j]
        return rgb

    def test_mcu_constant_420_is_exact(self):
        from tlmc_etl_spark.operators.jpeg import encode_color_jpeg, parse_jpeg_rgb

        rgb = self._mosaic(41)
        dec = parse_jpeg_rgb(encode_color_jpeg(rgb, "420"))
        assert np.abs(dec - self._want(rgb)).max() < 1e-9

    def test_block_constant_444_is_exact(self):
        from tlmc_etl_spark.operators.jpeg import encode_color_jpeg, parse_jpeg_rgb

        rng = np.random.default_rng(43)
        rgb = np.repeat(
            np.repeat(rng.integers(0, 256, (4, 4, 3)).astype(np.float64), 8, 0),
            8, 1,
        )
        dec = parse_jpeg_rgb(encode_color_jpeg(rgb, "444"))
        assert np.abs(dec - self._want(rgb)).max() < 1e-9

    def test_gradient_444_within_dct_rounding(self):
        from tlmc_etl_spark.operators.jpeg import encode_color_jpeg, parse_jpeg_rgb

        g = np.zeros((24, 24, 3))
        g[..., 0] = np.linspace(0, 255, 24)[None, :]
        g[..., 1] = np.linspace(255, 0, 24)[:, None]
        g[..., 2] = 128.0
        dec = parse_jpeg_rgb(encode_color_jpeg(g, "444"))
        # q=1: only coefficient-rounding error survives
        assert np.abs(dec - self._want(g)).max() < 2.0

    def test_odd_dimensions_crop(self):
        from tlmc_etl_spark.operators.jpeg import encode_color_jpeg, parse_jpeg_rgb

        rgb = np.zeros((20, 25, 3))
        rgb[...] = (10, 200, 57)
        dec = parse_jpeg_rgb(encode_color_jpeg(rgb, "420"))
        assert dec.shape == (20, 25, 3)
        assert np.abs(dec - self._want(rgb)).max() < 1e-9

    def test_luma_view_of_color_jpeg_unchanged(self):
        # parse_jpeg_luma on a colour payload still returns the exact Y
        # plane (the pre-existing contract the refactor must preserve)
        from tlmc_etl_spark.operators.jpeg import (
            encode_color_jpeg,
            rgb_to_ycbcr,
        )

        rgb = self._mosaic(47)
        y = parse_jpeg_luma(encode_color_jpeg(rgb, "420"))
        assert np.abs(y - rgb_to_ycbcr(rgb)[:, :, 0]).max() < 1e-9

    def test_gray_payload_replicates_channels(self):
        from tlmc_etl_spark.operators.jpeg import parse_jpeg_rgb

        rng = np.random.default_rng(53)
        img = rng.integers(0, 256, (16, 16)).astype(np.float64)
        dec = parse_jpeg_rgb(encode_gray_jpeg(img))
        assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
        assert np.array_equal(dec[:, :, 0], parse_jpeg_luma(encode_gray_jpeg(img)))

    def test_progressive_color_decodes(self):
        # round 11: SOF2 colour is no longer a boundary — the constant-
        # chroma progressive stream decodes through the rgb path, with
        # Cb=Cr=128 collapsing to R=G=B=Y
        from tlmc_etl_spark.operators.jpeg import (
            encode_420_progressive,
            parse_jpeg_rgb,
        )

        y = np.full((16, 16), 90.0)
        dec = parse_jpeg_rgb(encode_420_progressive(y))
        assert np.abs(dec - 90.0).max() < 1e-9

    @pytest.mark.parametrize("sampling", ["420", "444"])
    def test_progressive_color_equals_baseline_color(self, sampling):
        from tlmc_etl_spark.operators.jpeg import (
            encode_color_jpeg,
            encode_color_progressive,
            parse_jpeg_rgb,
        )

        for seed in (61, 67, 71):
            rgb = self._mosaic(seed)
            prog = parse_jpeg_rgb(encode_color_progressive(rgb, sampling))
            base = parse_jpeg_rgb(encode_color_jpeg(rgb, sampling))
            assert np.array_equal(prog, base), seed
            assert np.abs(prog - self._want(rgb)).max() < 1e-9, seed

    @pytest.mark.parametrize("shape", [(24, 24), (20, 25), (17, 31), (8, 40)])
    @pytest.mark.parametrize("sampling", ["420", "444"])
    def test_progressive_color_odd_sizes_match_baseline(self, shape, sampling):
        # regression: non-interleaved AC scans cover the component's
        # ceil-grid (A.2.2), NOT the padded MCU grid — at 4:2:0 the
        # padded luma grid has extra blocks per row that desync every
        # following row (caught at 24x24/420: error 12.1)
        from tlmc_etl_spark.operators.jpeg import (
            encode_color_jpeg,
            encode_color_progressive,
            parse_jpeg_rgb,
        )

        rng = np.random.default_rng(sum(shape))
        h, w = shape
        rgb = np.zeros((h, w, 3))
        rgb[..., 0] = np.linspace(0, 255, w)[None, :]
        rgb[..., 1] = np.linspace(255, 0, h)[:, None]
        rgb[..., 2] = rng.integers(0, 256)
        prog = parse_jpeg_rgb(encode_color_progressive(rgb, sampling))
        base = parse_jpeg_rgb(encode_color_jpeg(rgb, sampling))
        assert prog.shape == (h, w, 3)
        assert np.array_equal(prog, base)

    def test_progressive_color_gradient_matches_baseline(self):
        # non-constant blocks: every scan family (interleaved DC, three
        # per-component AC bands, DC refinement) carries real data and
        # must reassemble the SAME quantized coefficients as baseline
        from tlmc_etl_spark.operators.jpeg import (
            encode_color_jpeg,
            encode_color_progressive,
            parse_jpeg_rgb,
        )

        g = np.zeros((24, 24, 3))
        g[..., 0] = np.linspace(0, 255, 24)[None, :]
        g[..., 1] = np.linspace(255, 0, 24)[:, None]
        g[..., 2] = 128.0
        prog = parse_jpeg_rgb(encode_color_progressive(g, "444"))
        base = parse_jpeg_rgb(encode_color_jpeg(g, "444"))
        assert np.array_equal(prog, base)

    def test_progressive_gray_rgb_replicates(self):
        from tlmc_etl_spark.operators.jpeg import (
            encode_gray_progressive,
            parse_jpeg_rgb,
        )

        rng = np.random.default_rng(73)
        img = rng.integers(0, 256, (16, 16)).astype(np.float64)
        dec = parse_jpeg_rgb(encode_gray_progressive(img))
        assert np.array_equal(dec[:, :, 0], dec[:, :, 2])
        assert np.array_equal(
            dec[:, :, 0], parse_jpeg_luma(encode_gray_progressive(img))
        )

    def test_truncation_raises(self):
        from tlmc_etl_spark.operators.jpeg import encode_color_jpeg, parse_jpeg_rgb

        payload = encode_color_jpeg(self._mosaic(59), "420")
        for cut in (len(payload) // 2, 30, len(payload) - 4):
            with pytest.raises(ValueError):
                parse_jpeg_rgb(payload[:cut])
