"""Multimodal plumbing tests: binary columns through Arrow batches,
deterministic stub decode, and the NotImplementedError gate for real
codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.multimodal import (
    decode_payload,
    extract_features,
    synthetic_media_from_documents,
)
from tlmc_etl_spark.sources.tables import load_table


def test_features_deterministic_and_unit_norm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = synthetic_media_from_documents(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r["media_id"]: r for r in feats}
    for r in feats:
        v = np.array(r["feature"])
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        assert r["n_bytes"] > 0
    # rerun → identical features (stub is deterministic)
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    for mid, row in by_id.items():
        assert again[mid] == row["feature"]


def test_remaining_real_kinds_raise_not_implemented():
    # the boundary is now format-shaped: compressed containers only raise
    # when the matching codec (ffmpeg / PIL) is absent from the environment
    from tlmc_etl_spark.operators.multimodal import _ffmpeg_on_path, _pil_available

    if not _ffmpeg_on_path():
        with pytest.raises(NotImplementedError):
            decode_payload("video", b"\x00\x00\x00\x18ftypmp42")
    if not _pil_available():
        with pytest.raises(NotImplementedError):
            decode_payload("image", b"II*\x00" + bytes(16))  # TIFF: no stdlib arm


def _ppm_bytes(w, h, rgb):
    """rgb: (h, w, 3) uint8 array → binary P6 payload (with a comment,
    exercising the header tokenizer)."""
    header = f"P6\n# test image\n{w} {h}\n255\n".encode()
    return header + rgb.tobytes()


def _bmp_bytes(rgb):
    """rgb: (h, w, 3) uint8 top-down → 24-bit BI_RGB BMP (bottom-up,
    4-byte row alignment), built by hand with struct."""
    import struct

    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for row in rgb[::-1]:  # bottom-up storage
        bgr = row[:, ::-1].tobytes()
        data += bgr + b"\x00" * (stride - len(bgr))
    off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + bytes(data)
    )


class TestImageDecodeArm:
    def test_ppm_decodes_to_finite_unit_feature(self):
        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        v = decode_payload("image", _ppm_bytes(16, 16, rgb))
        assert v.shape == (16,)
        assert np.isfinite(v).all()
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9

    def test_pgm_and_ppm_agree_on_gray_input(self):
        g = np.arange(64, dtype=np.uint8).reshape(8, 8)
        pgm = f"P5\n8 8\n255\n".encode() + g.tobytes()
        rgb = np.repeat(g[:, :, None], 3, axis=2)
        va = decode_payload("image", pgm)
        vb = decode_payload("image", _ppm_bytes(8, 8, rgb))
        # luma of (x,x,x) == x, so both forms pool identically
        assert np.allclose(va, vb, atol=1e-9)

    def test_bmp_matches_ppm_pixels(self):
        rng = np.random.default_rng(11)
        rgb = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)  # stride pad
        va = decode_payload("image", _ppm_bytes(7, 10, rgb))
        vb = decode_payload("image", _bmp_bytes(rgb))
        assert np.allclose(va, vb, atol=1e-9)


def _png_bytes(px, ctype, filters=None, plte=None):
    """Hand-built PNG: px is (h, w, channels) uint8 (or (h, w) for gray /
    palette indices); `filters` picks the per-row filter byte (default 0)
    and the scanlines are PRE-FILTERED accordingly so the decoder's
    reconstruction is what the test exercises."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    filters = filters or [0] * h
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        line = px[r].reshape(-1).astype(np.int32)
        f = filters[r]
        enc = line.copy()
        for i in range(w * ch):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if f == 1:
                enc[i] = (line[i] - a) % 256
            elif f == 2:
                enc[i] = (line[i] - b) % 256
            elif f == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) % 256
            elif f == 4:
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) % 256
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if plte is not None:
        out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


class TestPngDecodeArm:
    """The stdlib PNG arm (round-7 VERDICT #5): zlib + filter
    reconstruction closes the most common compressed-image case in a
    codec-less container — gated against the uncompressed arms, which
    the same pixels must feature identically through."""

    def test_gray_png_matches_pgm_exactly(self):
        g = ((np.arange(256).reshape(16, 16) * 7) % 256).astype(np.uint8)
        pgm = b"P5\n16 16\n255\n" + g.tobytes()
        v_png = decode_payload("image", _png_bytes(g, ctype=0))
        v_pgm = decode_payload("image", pgm)
        assert np.array_equal(v_png, v_pgm)

    def test_rgb_png_matches_ppm_exactly(self):
        rng = np.random.default_rng(23)
        rgb = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
        v_png = decode_payload("image", _png_bytes(rgb, ctype=2))
        v_ppm = decode_payload("image", _ppm_bytes(9, 12, rgb))
        assert np.array_equal(v_png, v_ppm)

    def test_all_five_filters_reconstruct(self):
        # one row per filter type (and a wrap of the cycle) — any
        # reconstruction bug flips pixels and the feature diverges from
        # the filter-0 encoding of the same image
        rng = np.random.default_rng(31)
        rgb = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
        plain = decode_payload("image", _png_bytes(rgb, ctype=2))
        filtered = decode_payload(
            "image",
            _png_bytes(rgb, ctype=2, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0]),
        )
        assert np.array_equal(plain, filtered)

    def test_palette_png_matches_rgb_form(self):
        rng = np.random.default_rng(41)
        plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(9, 9), dtype=np.uint8)
        v_pal = decode_payload("image", _png_bytes(idx, ctype=3, plte=plte))
        v_rgb = decode_payload("image", _png_bytes(plte[idx], ctype=2))
        assert np.array_equal(v_pal, v_rgb)

    def test_alpha_channels_ignored_for_luma(self):
        rng = np.random.default_rng(43)
        g = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        ga = np.stack([g, rng.integers(0, 256, size=(8, 8), dtype=np.uint8)], axis=2)
        v_ga = decode_payload("image", _png_bytes(ga, ctype=4))
        v_g = decode_payload("image", _png_bytes(g, ctype=0))
        assert np.array_equal(v_ga, v_g)

    def test_property_random_images_roundtrip_exactly(self):
        # hypothesis-style property, deterministic seeds: ANY 8-bit
        # image under ANY per-row filter assignment must reconstruct to
        # the exact pixels (decoder checked against the directly
        # computed luma, not another parser)
        from tlmc_etl_spark.operators.multimodal import _parse_png

        rng = np.random.default_rng(97)
        for trial in range(25):
            h = int(rng.integers(1, 24))
            w = int(rng.integers(1, 24))
            ctype, ch = [(0, 1), (2, 3), (6, 4)][int(rng.integers(0, 3))]
            px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            filters = [int(f) for f in rng.integers(0, 5, size=h)]
            gray = _parse_png(
                _png_bytes(px if ch > 1 else px[:, :, 0], ctype, filters=filters)
            )
            pxf = px.astype(np.float64)
            want = (
                pxf[:, :, 0]
                if ch == 1
                else pxf[:, :, 0] * 0.299 + pxf[:, :, 1] * 0.587 + pxf[:, :, 2] * 0.114
            )
            assert np.array_equal(gray, want), (
                f"trial {trial}: h={h} w={w} ctype={ctype} filters={filters}"
            )

    def test_16bit_png_matches_8bit_twin_exactly(self):
        """The v*257 bit-replication expansion: one image stored at
        either depth must yield the IDENTICAL luma (0xABAB = 0xAB*257,
        so /257 inverts exactly in float64)."""
        from tlmc_etl_spark.operators.multimodal import (
            _parse_png,
            encode_gray_png,
        )

        rng = np.random.default_rng(51)
        img = rng.integers(0, 256, size=(19, 13)).astype(np.float64)
        g8 = _parse_png(encode_gray_png(img))
        g16 = _parse_png(encode_gray_png(img * 257, depth=16))
        assert np.array_equal(g8, img) and np.array_equal(g16, img)
        # full-range 16-bit values (not expansions) keep their precision
        deep = rng.integers(0, 65536, size=(8, 8)).astype(np.float64)
        got = _parse_png(encode_gray_png(deep, depth=16))
        assert np.array_equal(got * 257.0, deep)

    def test_adam7_interlace_matches_sequential(self):
        """Adam7 and sequential storage of the same pixels must decode
        identically — including odd sizes where late passes are ragged
        or empty (1x1 has ONLY pass 1; 2x3 has empty passes)."""
        from tlmc_etl_spark.operators.multimodal import (
            _parse_png,
            encode_gray_png,
        )

        rng = np.random.default_rng(52)
        for h, w in [(32, 32), (17, 23), (1, 1), (2, 3), (9, 5), (8, 1)]:
            img = rng.integers(0, 256, size=(h, w)).astype(np.float64)
            seq = _parse_png(encode_gray_png(img))
            il = _parse_png(encode_gray_png(img, interlace=1))
            assert np.array_equal(seq, il), (h, w)
            il16 = _parse_png(encode_gray_png(img * 257, depth=16, interlace=1))
            assert np.array_equal(il16, img), (h, w)

    def test_interlaced_filters_reset_per_pass(self):
        """Each Adam7 pass filters against ITS OWN previous scanline,
        not the prior pass's last row — encode sub-images with Up/Sub
        filters and the reconstruction must still match."""
        import struct
        import zlib

        from tlmc_etl_spark.operators.multimodal import _ADAM7, _parse_png

        rng = np.random.default_rng(53)
        h = w = 16
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if not sub.size:
                continue
            prev = np.zeros(sub.shape[1], dtype=np.int64)
            for r in range(sub.shape[0]):
                if r % 2:  # Up filter
                    raw += b"\x02" + (
                        (sub[r].astype(np.int64) - prev) % 256
                    ).astype(np.uint8).tobytes()
                else:  # Sub filter
                    row = sub[r].astype(np.int64)
                    d = row.copy()
                    d[1:] = (row[1:] - row[:-1]) % 256
                    raw += b"\x01" + d.astype(np.uint8).tobytes()
                prev = sub[r].astype(np.int64)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(_parse_png(payload), img.astype(np.float64))

    def test_corrupt_zlib_stream_raises_value_error(self):
        from tlmc_etl_spark.operators.multimodal import (
            _parse_png,
            encode_gray_png,
        )

        enc = bytearray(encode_gray_png(np.full((8, 8), 7.0)))
        # IDAT payload starts after sig(8) + IHDR chunk(25) + len+type(8)
        enc[45] ^= 0xFF
        with pytest.raises(ValueError):
            _parse_png(bytes(enc))

    def test_tiny_image_smaller_than_pool_grid_is_finite(self):
        rgb = np.full((2, 2, 3), 128, dtype=np.uint8)
        v = decode_payload("image", _ppm_bytes(2, 2, rgb))
        assert np.isfinite(v).all()

    def test_garbage_raises_not_silently_fakes(self):
        from tlmc_etl_spark.operators.multimodal import _pil_available

        if _pil_available():
            pytest.skip("PIL present; it may sniff other formats")
        # truncated JPEG: reaches the stdlib JPEG arm, which must error
        # (never fake pixels)
        with pytest.raises(ValueError):
            decode_payload("image", b"\xff\xd8\xff\xe0JFIF-ish")
        # unknown magic: no arm claims it
        with pytest.raises(NotImplementedError):
            decode_payload("image", b"\x00\x01not-an-image")


def _y4m_bytes(frames, cs="420"):
    """frames: list of (h, w) uint8 luma arrays → YUV4MPEG2 payload with
    flat chroma planes (value 128) sized per the colourspace tag."""
    h, w = frames[0].shape
    chroma = {"mono": 0, "420": (w * h) // 2, "422": w * h, "444": 2 * w * h}[cs]
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F24:1 Ip A1:1 C{cs}\n".encode())
    for f in frames:
        out += b"FRAME\n" + f.tobytes() + b"\x80" * chroma
    return bytes(out)


class TestGifDecodeArm:
    """GIF87a/89a LZW decode (operators/multimodal.py) — the last
    common legacy format in album artwork scans."""

    def test_roundtrip_plain_and_interlaced(self):
        from tlmc_etl_spark.operators.multimodal import (
            _parse_gif,
            encode_gray_gif,
        )

        rng = np.random.default_rng(61)
        for h, w in [(32, 32), (17, 23), (1, 1), (2, 3), (9, 5)]:
            img = rng.integers(0, 256, size=(h, w)).astype(np.float64)
            for il in (False, True):
                got = _parse_gif(encode_gray_gif(img, interlace=il))
                # gray palette luma = i*(0.299+0.587+0.114): float dust only
                assert np.allclose(got, img, atol=1e-9), (h, w, il)

    def test_lzw_width_growth_and_dict_reset(self):
        from tlmc_etl_spark.operators.multimodal import (
            _gif_lzw_decode,
            _gif_lzw_encode,
            _parse_gif,
            encode_gray_gif,
        )

        # repetitive image → dictionary marches through 9..12-bit widths
        big = (np.add.outer(np.arange(300), np.arange(400)) % 7 * 36).astype(
            np.float64
        )
        assert np.allclose(_parse_gif(encode_gray_gif(big)), big, atol=1e-9)
        # incompressible image → 4096-entry reset path
        rng = np.random.default_rng(62)
        noise = rng.integers(0, 256, size=(256, 256)).astype(np.float64)
        assert np.allclose(_parse_gif(encode_gray_gif(noise)), noise, atol=1e-9)
        # small alphabet exercises sub-byte minimum code sizes
        seq = bytes([0, 1, 2, 3, 0, 0, 1, 1, 2, 2, 3, 3] * 20)
        got = _gif_lzw_decode(_gif_lzw_encode(seq, 2), 2, len(seq))
        assert got.tobytes() == seq

    def test_hand_pinned_lzw_streams(self):
        """Literal LZW bits written by hand from the GIF89a spec (not
        encoder output), pinning both dictionary rules and the width
        bump at table size 8 (mcs=2: clear=4, end=5)."""
        from tlmc_etl_spark.operators.multimodal import _gif_lzw_decode

        def pack(codes):
            acc, cur, n = bytearray(), 0, 0
            for code, w in codes:
                cur |= code << n
                n += w
                while n >= 8:
                    acc.append(cur & 0xFF)
                    cur >>= 8
                    n -= 8
            if n:
                acc.append(cur & 0xFF)
            return bytes(acc)

        # existing-code rule: 6 = the [0,1] string added while decoding
        # code 1; its use appends [1,0] as 7 → size 8 → width becomes 4,
        # so the NEXT codes are read 4 bits wide
        got = _gif_lzw_decode(
            pack([(4, 3), (0, 3), (1, 3), (6, 3), (6, 4), (5, 4)]), 2, 6
        )
        assert got.tolist() == [0, 1, 0, 1, 0, 1]
        # code == len(table) rule (the KwKwK case): 7 is not in the
        # table yet → prev + prev[0] = [1, 1]
        got = _gif_lzw_decode(
            pack([(4, 3), (0, 3), (1, 3), (7, 3), (5, 4)]), 2, 4
        )
        assert got.tolist() == [0, 1, 1, 1]
        # a code PAST len(table) is corruption, not decodable: after
        # clear+one literal the table holds 6 entries, so 7 > 6
        with pytest.raises(ValueError, match="out of range"):
            _gif_lzw_decode(pack([(4, 3), (0, 3), (7, 3), (5, 3)]), 2, 8)

    def test_extensions_skipped_and_first_frame_wins(self):
        from tlmc_etl_spark.operators.multimodal import (
            _parse_gif,
            encode_gray_gif,
        )

        img = (np.arange(64).reshape(8, 8) * 3 % 256).astype(np.float64)
        enc = encode_gray_gif(img)
        # splice a graphic-control extension between the palette and
        # the image descriptor (0x21 0xF9, 4-byte block, terminator);
        # the descriptor sits at header(6) + LSD(7) + 256-entry GCT(768)
        at = 6 + 7 + 768
        assert enc[at] == 0x2C
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        assert np.allclose(
            _parse_gif(enc[:at] + gce + enc[at:]), img, atol=1e-9
        )

    def test_torn_streams_raise_value_error(self):
        from tlmc_etl_spark.operators.multimodal import (
            _parse_gif,
            encode_gray_gif,
        )

        enc = encode_gray_gif(
            np.arange(256).reshape(16, 16).astype(np.float64)
        )
        for cut in (10, 12, 700, 790, len(enc) - 2):
            with pytest.raises(ValueError):
                _parse_gif(enc[:cut])
        with pytest.raises(ValueError):
            _parse_gif(b"GIF89a" + bytes(4))

    def test_random_gif_blobs_never_leak(self):
        from tlmc_etl_spark.operators.multimodal import _parse_gif

        rng = np.random.default_rng(63)
        for _ in range(200):
            blob = b"GIF89a" + bytes(
                rng.integers(0, 256, size=int(rng.integers(0, 150)),
                             dtype=np.uint8)
            )
            try:
                _parse_gif(blob)
            except ValueError:
                pass

    def test_dispatch_matches_png_of_same_pixels(self):
        from tlmc_etl_spark.operators.multimodal import (
            encode_gray_gif,
            encode_gray_png,
        )

        rng = np.random.default_rng(64)
        img = rng.integers(0, 256, size=(32, 32)).astype(np.float64)
        v_gif = decode_payload("image", encode_gray_gif(img))
        v_png = decode_payload("image", encode_gray_png(img.astype(np.uint8)))
        assert np.allclose(v_gif, v_png, atol=1e-9)


class TestVideoDecodeArm:
    def test_y4m_decodes_to_finite_unit_feature(self):
        rng = np.random.default_rng(3)
        frames = [
            rng.integers(0, 256, size=(12, 16), dtype=np.uint8) for _ in range(5)
        ]
        v = decode_payload("video", _y4m_bytes(frames))
        assert v.shape == (16,)
        assert np.isfinite(v).all()
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9

    def test_chroma_subsampling_never_leaks_into_luma(self):
        # identical luma under C420/C422/C444/Cmono must give identical
        # features — the parser must skip exactly the chroma bytes
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(3)]
        feats = [
            decode_payload("video", _y4m_bytes(frames, cs))
            for cs in ("mono", "420", "422", "444")
        ]
        for f in feats[1:]:
            assert np.allclose(feats[0], f, atol=1e-12)

    def test_single_frame_video_matches_image_pool_of_same_pixels(self):
        # one gray frame == the image arm's pooled luma of the same pixels
        g = np.arange(256, dtype=np.uint8).reshape(16, 16)
        vv = decode_payload("video", _y4m_bytes([g], "mono"))
        pgm = b"P5\n16 16\n255\n" + g.tobytes()
        vi = decode_payload("image", pgm)
        from tlmc_etl_spark.operators.multimodal import _pil_available

        if not _pil_available():  # identical pixel path only via the parsers
            assert np.allclose(vv, vi, atol=1e-9)

    def test_long_video_samples_uniformly_not_all_frames(self):
        from tlmc_etl_spark.operators.multimodal import _sample_frames

        idx = _sample_frames(100)
        assert len(idx) == 16 and idx[0] == 0 and idx[-1] == 93
        assert idx == sorted(idx)
        assert _sample_frames(7) == list(range(7))

    def test_truncated_and_malformed_payloads_raise(self):
        rng = np.random.default_rng(9)
        frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8)]
        good = _y4m_bytes(frames)
        with pytest.raises(ValueError):
            decode_payload_no_ffmpeg(good[:-10])  # truncated frame data
        with pytest.raises(ValueError):
            decode_payload_no_ffmpeg(good.replace(b"FRAME", b"FRUME"))

    def test_zero_frame_payload_raises(self):
        with pytest.raises(ValueError):
            decode_payload_no_ffmpeg(b"YUV4MPEG2 W8 H8 F24:1 C420\n")


def decode_payload_no_ffmpeg(payload):
    """Drive the stdlib Y4M arm directly (ffmpeg may exist on dev hosts)."""
    from tlmc_etl_spark.operators.multimodal import _parse_y4m, _video_feature

    return _video_feature(_parse_y4m(payload))


def test_media_schema_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = synthetic_media_from_documents(docs)
    p = str(tmp_path / "media")
    media.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.count() == 10
    row = back.filter(F.col("media_id") == "doc-0").first()
    assert row["kind"] == "synthetic"
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["content_type"] == "text/plain"


def test_dominant_colors_pixel_share_ordering(spark):
    # hand-built image: 60 red-ish, 30 green-ish, 10 blue-ish pixels —
    # palette must come back dominant-first with the quantized cube centers
    from tlmc_etl_spark.operators.multimodal import dominant_colors

    rows = (
        [(1, 250, 10, 10)] * 60 + [(1, 10, 250, 10)] * 30 + [(1, 10, 10, 250)] * 10
    )
    pixels = spark.createDataFrame(rows, "img long, r int, g int, b int")
    got = dominant_colors(pixels, "img", n_colors=8, levels=4).collect()
    assert len(got) == 1
    # levels=4 quantizes to cube centers 32/96/160/224: 250 -> 224 (e0), 10 -> 32 (20)
    assert got[0]["colors"] == ["#e02020", "#20e020", "#2020e0"]


def test_dominant_colors_tie_breaks_on_color_ascending(spark):
    from tlmc_etl_spark.operators.multimodal import dominant_colors

    rows = [(1, 250, 10, 10)] * 5 + [(1, 10, 10, 250)] * 5
    pixels = spark.createDataFrame(rows, "img long, r int, g int, b int")
    got = dominant_colors(pixels, "img").collect()[0]["colors"]
    assert got == ["#2020e0", "#e02020"], "equal shares must order by color asc"


def test_variant_ladder_never_upscales_and_keeps_original(spark, sf_dir):
    from tlmc_etl_spark.plans import QUERIES

    rows = QUERIES["artwork_variant_ladder"].fn(spark, sf_dir).collect()
    by_art = {}
    for r in rows:
        by_art.setdefault(r["artwork_id"], []).append(r)
    assert by_art
    for art, items in by_art.items():
        sizes = sorted(r["size_px"] for r in items)
        assert 0 in sizes, "original must be addressable through the ladder"
        # ladder rows scale down only: derived keys for rungs, library key for size 0
        for r in items:
            if r["size_px"] == 0:
                assert r["storage_key"].startswith("library/")
            else:
                assert r["storage_key"].startswith("_derived/artwork/")
                assert r["size_px"] in (120, 300, 600)


def test_short_audio_payload_yields_finite_features(monkeypatch):
    """Payloads shorter than FEATURE_DIM samples leave trailing RMS
    windows empty; np.mean(empty) is NaN (and truthy, so an `or 0.0`
    guard never fires) — the guard must be on slice length (round-6
    ADVICE). Fake the ffmpeg subprocess so the windowing logic is
    testable without the binary."""
    import subprocess

    from tlmc_etl_spark.operators import multimodal as mm

    class FakeProc:
        returncode = 0
        stdout = np.array([0.5, -0.5, 0.25], dtype="<f4").tobytes()  # 3 samples
        stderr = b""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: FakeProc())
    v = mm._decode_audio_ffmpeg(b"payload-bytes")
    assert len(v) == mm.FEATURE_DIM
    assert np.isfinite(v).all()
    assert np.any(v != 0)  # the populated windows still carry signal


class TestAudioDecodeArm:
    """kind='audio' in-container lanes: FLAC (exact RFC 9639 decode) and
    RIFF/WAVE, both landing in the shared RMS-envelope feature space."""

    @staticmethod
    def _decaying_tone(sr=24000, seconds=1.0):
        # a steady tone has a FLAT RMS envelope (centers to the zero
        # vector), so the feature needs amplitude variation
        t = np.arange(int(sr * seconds))
        x = np.sin(2 * np.pi * 440 * t / sr) * np.linspace(0.8, 0.05, len(t))
        return (x * 32767).astype(np.int64)

    def test_flac_payload_decodes_to_finite_unit_feature(self):
        from tlmc_etl_spark.operators.flac import encode_flac

        payload = encode_flac(self._decaying_tone(), 24000, mode="lpc")
        f = decode_payload("audio", payload)
        assert f.shape == (16,) and np.all(np.isfinite(f))
        assert abs(np.linalg.norm(f) - 1.0) < 1e-9
        # decaying amplitude -> strictly decreasing window RMS
        assert f[0] == f.max() and f[-1] == f.min()

    def test_flac_and_wav_of_same_samples_agree(self):
        # identical generator samples through both containers -> the
        # envelope features must agree to float precision (FLAC decode
        # is exact; WAV is the raw PCM)
        import io
        import wave

        from tlmc_etl_spark.operators.flac import encode_flac

        x = self._decaying_tone()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            w.writeframes(x.astype("<i2").tobytes())
        ff = decode_payload("audio", encode_flac(x, 24000))
        fw = decode_payload("audio", buf.getvalue())
        assert np.abs(ff - fw).max() < 1e-12

    def test_unknown_audio_format_raises_not_implemented(self):
        from tlmc_etl_spark.operators.multimodal import _ffmpeg_on_path

        if not _ffmpeg_on_path():
            with pytest.raises(NotImplementedError, match="neither FLAC"):
                decode_payload("audio", b"\xff\xf1" + bytes(64))  # ADTS

    def test_torn_flac_raises_value_error(self):
        from tlmc_etl_spark.pipelines.mert_standin import synth_tone_flac

        with pytest.raises(ValueError):
            decode_payload("audio", synth_tone_flac(440, 1.0)[:100])
