"""FLAC codec (operators/flac.py): exact decode, spec-built encode.

Trust chain: the CRC functions are pinned against PUBLISHED check values
(crc catalogs: CRC-8 poly 0x07 and CRC-16/BUYPASS over b"123456789"),
then hand-assembled frames — literal bit strings written from RFC 9639,
not produced by encode_flac — pin the decoder's bit layout, so
decode(encode(x)) == x round-trips are not a self-consistent loop.
An opt-in real-tool cross-check lives in test_real_tools.py.
"""

import numpy as np
import pytest

from tlmc_etl_spark.operators.flac import (
    _fixed_residual,
    _fixed_restore,
    _wasted_bits,
    crc8,
    crc16,
    encode_flac,
    flac_decode_pcm,
    parse_flac_audio,
)


class TestCrcPins:
    def test_crc8_published_check_value(self):
        # CRC-8 (poly 0x07, init 0, MSB-first): check value 0xF4
        assert crc8(b"123456789") == 0xF4

    def test_crc16_published_check_value(self):
        # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect): 0xFEE8
        assert crc16(b"123456789") == 0xFEE8

    def test_empty(self):
        assert crc8(b"") == 0 and crc16(b"") == 0


def _bits_to_bytes(s: str) -> bytes:
    s = s.replace(" ", "").replace("\n", "")
    assert len(s) % 8 == 0
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _streaminfo(sample_rate, channels, bps, total, block=16) -> bytes:
    import struct

    packed = (
        (sample_rate << 44) | ((channels - 1) << 41)
        | ((bps - 1) << 36) | total
    )
    si = struct.pack(">HH", block, block) + bytes(6)
    si += struct.pack(">Q", packed) + bytes(16)
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + si


class TestHandBuiltFrames:
    """Literal RFC 9639 bit layouts (not encoder output) -> decoder."""

    def test_constant_subframe(self):
        # header: sync(14)+res(1)+fixed(1) = FF F8; bs code 0110 (8-bit
        # field) + sr code 1001 (44.1k) = 69; mono(0000)+bps 100(16)+res
        # = 08; frame number 0; block size field 16-1
        header = bytes([0xFF, 0xF8, 0x69, 0x08, 0x00, 0x0F])
        header += bytes([crc8(header)])
        # subframe: pad 0 + type 000000 (CONSTANT) + no wasted = 00,
        # then one 16-bit sample = 7
        body = header + bytes([0x00, 0x00, 0x07])
        frame = body + crc16(body).to_bytes(2, "big")
        dec = parse_flac_audio(_streaminfo(44100, 1, 16, 16) + frame)
        assert dec["sample_rate"] == 44100
        assert dec["n_frames"] == 1
        assert np.array_equal(dec["samples"], np.full((16, 1), 7))

    def test_fixed_order1_rice(self):
        # samples [10, 12, 14, 13]: order-1 residuals [2, 2, -1],
        # zigzag [4, 4, 1]; rice k=1 -> (q, rem) = (2,0) (2,0) (0,1)
        header = bytes([0xFF, 0xF8, 0x69, 0x08, 0x00, 0x03])  # bs 4-1
        header += bytes([crc8(header)])
        sub = (
            "0" "001001" "0"            # pad, FIXED order 1, no wasted
            "0000000000001010"          # warmup sample 10
            "00" "0000" "0001"          # rice method 0, porder 0, k=1
            "001" "0" "001" "0" "1" "1"  # three residuals
            "0000"                       # byte-align padding
        )
        body = header + _bits_to_bytes(sub)
        frame = body + crc16(body).to_bytes(2, "big")
        dec = parse_flac_audio(_streaminfo(44100, 1, 16, 4) + frame)
        assert dec["samples"][:, 0].tolist() == [10, 12, 14, 13]

    def test_corrupt_crc8_raises(self):
        header = bytes([0xFF, 0xF8, 0x69, 0x08, 0x00, 0x0F])
        header += bytes([crc8(header) ^ 0x01])
        body = header + bytes([0x00, 0x00, 0x07])
        frame = body + crc16(body).to_bytes(2, "big")
        with pytest.raises(ValueError, match="CRC-8"):
            parse_flac_audio(_streaminfo(44100, 1, 16, 16) + frame)

    def test_corrupt_crc16_raises(self):
        header = bytes([0xFF, 0xF8, 0x69, 0x08, 0x00, 0x0F])
        header += bytes([crc8(header)])
        body = header + bytes([0x00, 0x00, 0x07])
        frame = body + (crc16(body) ^ 0x0100).to_bytes(2, "big")
        with pytest.raises(ValueError, match="CRC-16"):
            parse_flac_audio(_streaminfo(44100, 1, 16, 16) + frame)


def _rt(x, sr=44100, **kw):
    enc = encode_flac(x, sr, **kw)
    dec = parse_flac_audio(enc)
    want = np.asarray(x)
    if want.ndim == 1:
        want = want[:, None]
    assert np.array_equal(dec["samples"], want)
    return enc, dec


class TestRoundTrip:
    def test_fixed_mono(self):
        rng = np.random.default_rng(11)
        x = (np.arange(5000) % 257) * 3 + rng.integers(-5, 6, 5000)
        enc, dec = _rt(x.astype(np.int64), block_size=1024)
        assert dec["n_frames"] == 5
        assert len(enc) < 5000 * 2  # beats raw 16-bit PCM

    def test_all_fixed_orders_restore(self):
        rng = np.random.default_rng(13)
        for order in range(5):
            x = rng.integers(-1000, 1000, 200).astype(np.int64)
            r = _fixed_residual(x, order)
            assert np.array_equal(_fixed_restore(x[:order], r, order), x)

    def test_high_fixed_order_smooth_signal(self):
        q = (np.arange(2000) ** 2 // 7).astype(np.int64) % 16000
        _rt(q, block_size=512)

    def test_lpc_tone(self):
        # high-frequency tone: fixed differences AMPLIFY (gain
        # |2-2cos w| > 1 per order), while a 2-tap LPC models the
        # recurrence x[i] = 2cos(w) x[i-1] - x[i-2] almost exactly
        t = np.arange(11025)
        tone = (np.sin(2 * np.pi * 6000 * t / 44100) * 12000).astype(
            np.int64
        )
        enc_lpc, _ = _rt(tone, block_size=4096, mode="lpc")
        enc_fix, _ = _rt(tone, block_size=4096)
        assert len(enc_lpc) < len(enc_fix)
        assert len(enc_lpc) < 11025 * 2  # and beats raw PCM

    @pytest.mark.parametrize(
        "stereo", ["independent", "left_side", "right_side", "mid_side"]
    )
    @pytest.mark.parametrize("mode", ["auto", "lpc"])
    def test_stereo_modes(self, stereo, mode):
        rng = np.random.default_rng(17)
        x = (np.arange(3000) % 211) * 4 + rng.integers(-4, 5, 3000)
        st = np.stack(
            [x, (x // 2) + rng.integers(-3, 4, 3000)], axis=1
        ).astype(np.int64)
        _rt(st, block_size=1024, stereo=stereo, mode=mode, lpc_order=4)

    def test_partitioned_residual(self):
        rng = np.random.default_rng(19)
        x = (np.arange(4096) % 300) + rng.integers(-8, 9, 4096)
        _rt(x.astype(np.int64), block_size=1024, partition_order=3)

    def test_verbatim_and_escape(self):
        # full-range noise defeats every predictor: verbatim subframes
        # and (inside fixed mode) escape-coded partitions stay exact
        rng = np.random.default_rng(23)
        x = rng.integers(-32768, 32767, 600).astype(np.int64)
        _rt(x, block_size=256, mode="verbatim")
        _rt(x, block_size=256)

    def test_constant_block(self):
        enc, dec = _rt(np.full(1000, -123, dtype=np.int64), block_size=512)
        assert len(enc) < 120  # constant subframes are a few bytes each

    def test_wasted_bits(self):
        x = (np.arange(2000, dtype=np.int64) % 173) * 8
        assert _wasted_bits(x, 16) == 3
        _rt(x, block_size=1024)

    @pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
    def test_bit_depths(self, bps):
        rng = np.random.default_rng(bps)
        lim = 1 << (bps - 1)
        x = rng.integers(-lim, lim, 500).astype(np.int64)
        _, dec = _rt(x, bits_per_sample=bps, block_size=256)
        assert dec["bits_per_sample"] == bps

    def test_short_stream(self):
        _rt(np.arange(20, dtype=np.int64), block_size=4096)

    def test_tail_block_shorter_than_partitions(self):
        # 2500 % 1024 leaves a 452-sample tail: the tail frame must drop
        # to a partition order that divides it
        x = (np.arange(2500, dtype=np.int64) % 97) * 5
        _rt(x, block_size=1024, partition_order=2)

    def test_partition_order_clamps_to_predictor_order(self):
        """Legal (block_size, lpc_order, partition_order) combinations
        must encode: the first partition holds part_len - order samples,
        so the writer shrinks the partition order until it fits instead
        of raising (block 16, order-2 partitions, LPC order 8 ⇒
        part_len 4 < 8 without the clamp)."""
        rng = np.random.default_rng(7)
        x = rng.integers(-2000, 2000, 16).astype(np.int64)
        _rt(x, block_size=16, partition_order=2, mode="lpc", lpc_order=8)
        # short tail blocks hit the same clamp through a dividing order
        y = rng.integers(-2000, 2000, 1024 + 24).astype(np.int64)
        _rt(y, block_size=1024, partition_order=3, mode="lpc", lpc_order=8)

    def test_pcm_convenience(self):
        t = np.arange(4410)
        tone = (np.sin(2 * np.pi * 440 * t / 44100) * 12000).astype(np.int64)
        mono, sr = flac_decode_pcm(encode_flac(tone, 44100))
        assert sr == 44100 and mono.shape == (4410,)
        assert abs(float(np.max(mono)) - int(np.max(tone)) / 32768) < 1e-12

    def test_amplitude_guard(self):
        with pytest.raises(ValueError, match="range"):
            encode_flac(np.array([40000]), 44100, bits_per_sample=16,
                        block_size=16)


class TestStrictness:
    """The parsers' []/None-or-ValueError contract under torn input."""

    def _valid(self):
        x = (np.arange(3000, dtype=np.int64) % 211) * 4
        return encode_flac(x, 44100, block_size=1024)

    def test_non_flac_is_none(self):
        assert parse_flac_audio(None) is None
        assert parse_flac_audio(b"") is None
        assert parse_flac_audio(b"RIFFxxxxWAVE" + bytes(64)) is None

    def test_truncation_raises(self):
        enc = self._valid()
        for cut in (len(enc) - 1, len(enc) // 2, 60, 45):
            with pytest.raises(ValueError):
                parse_flac_audio(enc[:cut])

    def test_sync_corruption_raises(self):
        enc = bytearray(self._valid())
        enc[42] ^= 0x01  # first frame's sync byte
        with pytest.raises(ValueError):
            parse_flac_audio(bytes(enc))

    def test_single_bit_flips_never_leak(self):
        """Any single-bit corruption in the audio region either still
        raises ValueError (CRCs catch every 1-bit flip) — never an
        IndexError, struct.error, or silent wrong PCM."""
        enc = self._valid()
        rng = np.random.default_rng(29)
        for _ in range(80):
            pos = int(rng.integers(42, len(enc)))
            bit = int(rng.integers(8))
            torn = bytearray(enc)
            torn[pos] ^= 1 << bit
            with pytest.raises(ValueError):
                parse_flac_audio(bytes(torn))

    def test_lpc_bit_flips_never_leak_overflow(self):
        """Corruption in an LPC subframe BODY passes the header CRC-8
        (CRC-16 runs only after subframe decode) and feeds the integer
        feedback loop — which can explode past int64. The restore must
        bound-check and raise ValueError, never OverflowError from the
        int64 conversion. Fuzzes the exact shape the advisory reproduced
        (mid_side LPC stream, single-bit flips)."""
        t = np.arange(6000)
        left = (np.sin(2 * np.pi * 997 * t / 44100) * 14000).astype(np.int64)
        right = (np.sin(2 * np.pi * 1213 * t / 44100) * 11000).astype(
            np.int64
        )
        enc = encode_flac(np.stack([left, right], axis=1), 44100,
                          stereo="mid_side", mode="lpc", block_size=2048)
        rng = np.random.default_rng(1)
        for _ in range(300):
            pos = int(rng.integers(42, len(enc)))
            bit = int(rng.integers(8))
            torn = bytearray(enc)
            torn[pos] ^= 1 << bit
            with pytest.raises(ValueError):
                parse_flac_audio(bytes(torn))

    def test_declared_total_mismatch_raises(self):
        enc = bytearray(self._valid())
        # STREAMINFO total_samples is the low 36 bits of the packed
        # word at bytes 18..25; clearing a set bit SHRINKS the declared
        # total (3000 -> 2992) so the frame walk overshoots it
        enc[25] ^= 0x08
        with pytest.raises(ValueError, match="declared"):
            parse_flac_audio(bytes(enc))


class TestWindowedReader:
    """The bit reader's sliding window: decode memory is O(window), not
    O(file) — an album-length payload must decode identically to the
    same stream read frame by frame."""

    def test_multi_window_stream_decodes_exactly(self):
        from tlmc_etl_spark.operators import flac as flac_mod

        rng = np.random.default_rng(61)
        n = 60_000
        x = (np.arange(n) % 257) * 3 + rng.integers(-5, 6, n)
        enc = encode_flac(x.astype(np.int64), 44100, block_size=4096)
        # force MANY window slides: 4 KB windows against a ~40 KB stream
        old = flac_mod._Bits._WINDOW_BYTES
        flac_mod._Bits._WINDOW_BYTES = 4096
        try:
            dec = parse_flac_audio(enc)
        finally:
            flac_mod._Bits._WINDOW_BYTES = old
        assert np.array_equal(dec["samples"][:, 0], x)
        # and the default window agrees
        dec2 = parse_flac_audio(enc)
        assert np.array_equal(dec2["samples"], dec["samples"])

    def test_partition_larger_than_window_falls_back(self):
        """Rice quotients are unbounded: a single partition can exceed
        the whole unpacked-bit window (here: one order-0 partition of
        4096 samples x several bits against a 512 B window). The fast
        set-bit walk must fall back to incremental reads — which slide
        per sample — instead of raising a spurious truncation error on
        valid data."""
        from tlmc_etl_spark.operators import flac as flac_mod

        rng = np.random.default_rng(83)
        x = rng.integers(-4000, 4000, 12_000).astype(np.int64)
        enc = encode_flac(x, 44100, block_size=4096, partition_order=0)
        old = flac_mod._Bits._WINDOW_BYTES
        flac_mod._Bits._WINDOW_BYTES = 512
        try:
            dec = parse_flac_audio(enc)
        finally:
            flac_mod._Bits._WINDOW_BYTES = old
        assert np.array_equal(dec["samples"][:, 0], x)

    def test_truncation_still_raises_across_windows(self):
        from tlmc_etl_spark.operators import flac as flac_mod

        x = (np.arange(30_000, dtype=np.int64) % 211) * 4
        enc = encode_flac(x, 44100, block_size=4096)
        old = flac_mod._Bits._WINDOW_BYTES
        flac_mod._Bits._WINDOW_BYTES = 4096
        try:
            with pytest.raises(ValueError):
                parse_flac_audio(enc[: len(enc) // 2])
        finally:
            flac_mod._Bits._WINDOW_BYTES = old


class TestStreaminfoMd5:
    """RFC 9639 §8.2: the encoder stamps the unencoded-PCM MD5 and the
    decoder verifies it — the one field frame CRCs do not cover."""

    def test_md5_known_vector(self):
        import hashlib

        from tlmc_etl_spark.operators.flac import pcm_md5

        # 16-bit LE interleaving computed by hand
        x = np.array([[1, -2], [300, -300]], dtype=np.int64)
        raw = b"\x01\x00\xfe\xff\x2c\x01\xd4\xfe"
        assert pcm_md5(x, 16) == hashlib.md5(raw).digest()
        # 24-bit: 3 LE bytes per sample
        y = np.array([[-1]], dtype=np.int64)
        assert pcm_md5(y, 24) == hashlib.md5(b"\xff\xff\xff").digest()

    def test_md5_tamper_detected(self):
        x = (np.arange(2000, dtype=np.int64) % 211) * 3
        enc = bytearray(encode_flac(x, 44100, block_size=1024))
        # STREAMINFO MD5 lives at bytes 8+18 .. 8+34 — not CRC-covered
        enc[30] ^= 0xFF
        with pytest.raises(ValueError, match="MD5"):
            parse_flac_audio(bytes(enc))

    def test_zero_md5_skips_check(self):
        x = (np.arange(500, dtype=np.int64) % 97) * 2
        enc = bytearray(encode_flac(x, 44100, block_size=256))
        enc[26:42] = bytes(16)  # unset, as many encoders leave it
        dec = parse_flac_audio(bytes(enc))
        assert np.array_equal(dec["samples"][:, 0], x)


class TestSeekRangeDecode:
    """SEEKTABLE emission + decode_range: the O(track)-not-O(album)
    access pattern the cue-split lane needs at scale."""

    @staticmethod
    def _stream(seek_every=4):
        rng = np.random.default_rng(71)
        n = 50_000
        x = ((np.arange(n) % 311) * 5 + rng.integers(-6, 7, n)).astype(
            np.int64
        )
        st = np.stack([x, x // 3], axis=1)
        return st, encode_flac(
            st, 44100, block_size=1024, seek_every=seek_every,
            stereo="mid_side",
        )

    def test_seektable_points_and_full_decode_unchanged(self):
        from tlmc_etl_spark.functions.media import parse_flac_metadata

        st, enc = self._stream()
        meta = parse_flac_metadata(enc)
        # ceil(49 frames / 4) points; first at sample 0, offset 0
        assert len(meta["seekpoints"]) == 13
        assert meta["seekpoints"][0] == (0, 0, 1024)
        s, off, ns = meta["seekpoints"][1]
        assert s == 4096 and ns == 1024 and off > 0
        assert np.array_equal(parse_flac_audio(enc)["samples"], st)

    def test_ranges_match_full_decode_exactly(self):
        from tlmc_etl_spark.operators.flac import decode_range

        st, enc = self._stream()
        for s0, ns in [(0, 100), (1024, 1024), (5000, 3000),
                       (49_000, 1000), (12_345, 1), (0, len(st))]:
            assert np.array_equal(decode_range(enc, s0, ns), st[s0 : s0 + ns])

    def test_range_without_seektable_falls_back_to_head(self):
        from tlmc_etl_spark.operators.flac import decode_range

        x = (np.arange(5000, dtype=np.int64) % 97) * 3
        enc = encode_flac(x, 44100, block_size=1024)
        assert np.array_equal(decode_range(enc, 3000, 500)[:, 0], x[3000:3500])

    def test_range_reads_less_than_full_stream(self):
        # byte-level evidence of the seek: a tail range must be decodable
        # from a TRUNCATED PREFIX extended only past the needed frames —
        # i.e. decode_range never touches bytes before its seek point
        from tlmc_etl_spark.operators.flac import decode_range
        from tlmc_etl_spark.functions.media import parse_flac_metadata

        st, enc = self._stream()
        meta = parse_flac_metadata(enc)
        # corrupt every audio byte BEFORE the last seek point: a decode
        # of the final range must not notice
        last_s, last_off, _ = meta["seekpoints"][-1]
        torn = bytearray(enc)
        a0 = meta["audio_offset"]
        for i in range(a0, a0 + last_off):
            torn[i] ^= 0x5A
        got = decode_range(bytes(torn), last_s, len(st) - last_s)
        assert np.array_equal(got, st[last_s:])

    def test_out_of_range_raises(self):
        from tlmc_etl_spark.operators.flac import decode_range

        st, enc = self._stream()
        with pytest.raises(ValueError, match="outside the stream"):
            decode_range(enc, len(st) - 10, 100)


class TestVariableBlocking:
    """Hand-built variable-blocking frames (strategy bit 1): the coded
    number is the SAMPLE number, which is what lets decode_range place a
    mid-stream frame without a walk from the head."""

    @staticmethod
    def _frame(sample_no: int, block_size: int, value: int) -> bytes:
        # sync+res+VARIABLE blocking = FF F9; bs code 0110 (8-bit
        # field) + sr 1001; mono + bps 16 + res = 08
        header = bytes([0xFF, 0xF9, 0x69, 0x08])
        from tlmc_etl_spark.operators.flac import _encode_coded_number

        header += _encode_coded_number(sample_no)
        header += bytes([block_size - 1])
        header += bytes([crc8(header)])
        body = header + bytes([0x00]) + value.to_bytes(2, "big", signed=True)
        return body + crc16(body).to_bytes(2, "big")

    def test_full_decode_and_range_entry(self):
        from tlmc_etl_spark.operators.flac import decode_range

        stream = (
            _streaminfo(44100, 1, 16, 24)
            + self._frame(0, 16, 5)
            + self._frame(16, 8, -9)
        )
        dec = parse_flac_audio(stream)
        assert dec["samples"][:, 0].tolist() == [5] * 16 + [-9] * 8
        got = decode_range(stream, 16, 8)
        assert got[:, 0].tolist() == [-9] * 8
        got2 = decode_range(stream, 14, 4)
        assert got2[:, 0].tolist() == [5, 5, -9, -9]

    def test_non_contiguous_sample_numbers_raise(self):
        from tlmc_etl_spark.operators.flac import decode_range

        stream = (
            _streaminfo(44100, 1, 16, 24)
            + self._frame(0, 16, 5)
            + self._frame(17, 8, -9)  # gap: claims sample 17, not 16
        )
        with pytest.raises(ValueError, match="non-contiguous"):
            decode_range(stream, 0, 24)

    def test_min_ne_max_streaminfo(self):
        # variable-blocking streams legitimately declare min != max:
        # range decode still places frames via the sample number ...
        import struct

        from tlmc_etl_spark.operators.flac import decode_range

        si = bytearray(_streaminfo(44100, 1, 16, 24))
        si[8:12] = struct.pack(">HH", 8, 16)  # min 8, max 16
        stream = bytes(si) + self._frame(0, 16, 5) + self._frame(16, 8, -9)
        assert decode_range(stream, 16, 8)[:, 0].tolist() == [-9] * 8
        # ... while FIXED-blocking frames are unplaceable and must raise
        fixed = bytearray(self._frame(0, 16, 5))
        fixed[1] = 0xF8  # clear the blocking-strategy bit
        fixed[6] = crc8(bytes(fixed[:6]))
        body = bytes(fixed[:10])
        fixed[10:] = crc16(body).to_bytes(2, "big")
        with pytest.raises(ValueError, match="min != max"):
            decode_range(bytes(si) + bytes(fixed), 0, 16)
