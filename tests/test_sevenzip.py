"""7z archive-index parse (operators/sevenzip.py): signature + end
header walk, stdlib-only, no extraction.

Trust chain (the flac.py/test_flac.py pattern): the variable-length
number codec and a complete minimal archive are HAND-ASSEMBLED from the
published 7zFormat.txt layout — literal bytes, not encode_7z output —
pinning the parser's byte layout; round-trips through the spec-built
writer then cover the wider shapes (LZMA header, solid folders, empty
files, unicode names). An opt-in real-`7z` cross-check lives in
test_real_tools.py.
"""

import struct
import zlib

import numpy as np
import pytest

from tlmc_etl_spark.operators.sevenzip import (
    _Reader,
    _write_number,
    encode_7z,
    header_span,
    parse_7z_index,
)

ENTRIES = [
    ("Album 1", True, None),
    ("Album 1/01 track.flac", False, b"fLaC" + bytes(300)),
    ("Album 1/cover.jpg", False, b"\xff\xd8" * 10),
    ("Album 1/empty.txt", False, b""),
    ("Scans", True, None),
    ("Scans/東方booklet.png", False, b"\x89PNG"),
]


class TestNumberCodec:
    """7zFormat.txt REAL_UINT64: leading set bits of the first byte
    count the extra little-endian bytes."""

    @pytest.mark.parametrize(
        "raw,want",
        [
            (b"\x00", 0),
            (b"\x7f", 0x7F),
            # 0x80|hi + 1 LE byte: value = lo | hi<<8
            (b"\x81\x23", 0x123),
            (b"\xbf\xff", 0x3FFF),
            # 2 extra bytes: first 0xC0|hi
            (b"\xc1\x34\x12", 0x11234),
            # full 8-byte form
            (b"\xff" + struct.pack("<Q", 2**56 + 5), 2**56 + 5),
        ],
    )
    def test_hand_pinned_reads(self, raw, want):
        assert _Reader(raw).number() == want

    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        for v in [0, 1, 0x7F, 0x80, 0x3FFF, 2**32, 2**56] + [
            int(x) for x in rng.integers(0, 2**62, 20)
        ]:
            assert _Reader(_write_number(v)).number() == v


def _hand_archive() -> bytes:
    """A complete one-file archive assembled byte-by-byte from the spec
    — independent of encode_7z. One stored file 'a.txt' of 5 bytes."""
    payload = b"hello"
    header = bytes(
        [
            0x01,  # kHeader
            0x04,  # kMainStreamsInfo
            0x06,  # kPackInfo
            0x00,  # PackPos = 0
            0x01,  # NumPackStreams = 1
            0x09, 0x05,  # kSize, size 5
            0x00,  # kEnd (pack info)
            0x07,  # kUnpackInfo
            0x0B,  # kFolder
            0x01,  # NumFolders = 1
            0x00,  # not external
            0x01,  # folder: 1 coder
            0x01, 0x00,  # flags: id size 1; codec id 00 (Copy)
            0x0C, 0x05,  # kCodersUnpackSize, 5
            0x00,  # kEnd (unpack info)
            0x00,  # kEnd (streams info)
            0x05,  # kFilesInfo
            0x01,  # NumFiles = 1
            0x11, 0x0D, 0x00,  # kName, size 13, not external
        ]
    ) + "a.txt".encode("utf-16-le") + b"\x00\x00" + bytes(
        [
            0x15, 0x06, 0x01, 0x00,  # kWinAttrib, size 6, all defined,
            0x20, 0x00, 0x00, 0x00,  # not external; FILE_ATTRIBUTE_ARCHIVE
            0x00,  # kEnd (files info)
            0x00,  # kEnd (header)
        ]
    )
    start = struct.pack("<QQI", len(payload), len(header), zlib.crc32(header))
    return (
        b"7z\xbc\xaf\x27\x1c" + bytes([0, 4])
        + struct.pack("<I", zlib.crc32(start)) + start
        + payload + header
    )


class TestHandBuiltArchive:
    def test_hand_pinned_layout_parses(self):
        idx = parse_7z_index(_hand_archive())
        assert idx == [
            {"path": "a.txt", "is_dir": False, "size": 5, "attrib": 0x20,
             "mtime_unix": None}
        ]

    def test_header_span(self):
        data = _hand_archive()
        off, size = header_span(data[:32])
        assert data[off] == 0x01  # kHeader
        assert off + size == len(data)

    def test_start_header_crc_checked(self):
        data = bytearray(_hand_archive())
        data[14] ^= 0x01  # NextHeaderOffset byte under the start CRC
        with pytest.raises(ValueError, match="CRC"):
            parse_7z_index(bytes(data))

    def test_end_header_crc_checked(self):
        data = bytearray(_hand_archive())
        data[-3] ^= 0x01  # inside the end header
        with pytest.raises(ValueError, match="CRC"):
            parse_7z_index(bytes(data))


class TestRoundTrip:
    @pytest.mark.parametrize("codec", ["copy", "lzma"])
    @pytest.mark.parametrize("solid", [False, True])
    def test_full_shapes(self, codec, solid):
        enc = encode_7z(ENTRIES, header_codec=codec, solid=solid,
                        mtime_unix=1_700_000_000)
        idx = parse_7z_index(enc)
        assert [(e["path"], e["is_dir"], e["size"]) for e in idx] == [
            (p, d, 0 if data is None else len(data)) for p, d, data in ENTRIES
        ]
        # dirs carry the directory attribute; empty FILES do not
        by_path = {e["path"]: e for e in idx}
        assert by_path["Scans"]["is_dir"] is True
        assert by_path["Album 1/empty.txt"]["is_dir"] is False
        assert all(e["mtime_unix"] == 1_700_000_000 for e in idx)

    def test_lzma_header_is_really_compressed(self):
        # many repetitive names: the encoded header must be smaller
        many = [(f"dir {i:03d}/file {i:03d}.flac", False, b"x") for i in range(80)]
        plain = encode_7z(many, header_codec="copy")
        packed = encode_7z(many, header_codec="lzma")
        assert len(packed) < len(plain) - 500
        assert parse_7z_index(packed) == parse_7z_index(plain)

    def test_dirs_only_archive(self):
        idx = parse_7z_index(encode_7z([("a", True, None), ("a/b", True, None)]))
        assert all(e["is_dir"] and e["size"] == 0 for e in idx)

    def test_backslash_normalization(self):
        idx = parse_7z_index(encode_7z([("top\\sub\\f.txt", False, b"x")]))
        assert idx[0]["path"] == "top/sub/f.txt"

    def test_no_mtime_block(self):
        idx = parse_7z_index(encode_7z([("f", False, b"xy")]))
        assert idx[0]["mtime_unix"] is None and idx[0]["size"] == 2


class TestStrictness:
    """[]/None-or-ValueError under torn input — no IndexError or
    struct.error may leak, and no silently short listing."""

    def test_non_archive_is_none(self):
        assert parse_7z_index(None) is None
        assert parse_7z_index(b"") is None
        assert parse_7z_index(b"CORRUPT not an archive") is None
        assert parse_7z_index(b"PK\x03\x04" + bytes(60)) is None

    def test_truncation_raises(self):
        enc = encode_7z(ENTRIES, header_codec="lzma")
        for cut in (20, 31, 40, len(enc) // 2, len(enc) - 1):
            with pytest.raises(ValueError):
                parse_7z_index(enc[:cut])

    @pytest.mark.parametrize("codec", ["copy", "lzma"])
    def test_byte_corruption_never_leaks(self, codec):
        """Corrupt any single byte: either the CRC catches it
        (ValueError) or — for payload bytes outside the headers — the
        listing is unchanged. Never a non-ValueError exception."""
        enc = encode_7z(ENTRIES, header_codec=codec, mtime_unix=1)
        want = parse_7z_index(enc)
        rng = np.random.default_rng(13)
        for _ in range(250):
            pos = int(rng.integers(0, len(enc)))
            torn = bytearray(enc)
            torn[pos] ^= 1 << int(rng.integers(8))
            try:
                got = parse_7z_index(bytes(torn))
            except ValueError:
                continue
            # flips in the signature/payload region may parse as
            # non-7z (None) or leave the listing intact — both honest
            assert got is None or got == want

    def test_random_blobs_never_leak(self):
        rng = np.random.default_rng(17)
        for _ in range(200):
            blob = b"7z\xbc\xaf\x27\x1c" + bytes(
                rng.integers(0, 256, size=int(rng.integers(0, 120)),
                             dtype=np.uint8)
            )
            try:
                parse_7z_index(blob)
            except ValueError:
                pass

    def test_multicoder_folder_uses_unbound_output_size(self):
        """7zIn.cpp GetUnpackSize: a folder's size is the out stream
        NOT consumed by any bind pair — which is NOT necessarily the
        last kCodersUnpackSize entry (filter chains like BCJ+LZMA bind
        the last coder's output). Hand-built streams info: 2 coders,
        bind pair consumes out stream 1, so the folder size is
        sizes[0]=5, not sizes[1]=7."""
        from tlmc_etl_spark.operators.sevenzip import (
            _Reader,
            _read_streams_info,
        )

        si = bytes(
            [
                0x06, 0x00, 0x01, 0x09, 0x07, 0x00,  # pack: pos 0, 1x7
                0x07, 0x0B, 0x01, 0x00,  # unpack, folder, 1, internal
                0x02,  # 2 coders
                0x01, 0x00,  # coder A: Copy
                0x01, 0x00,  # coder B: Copy
                0x01, 0x01,  # bind pair: in 1 <- out 1 (B's output)
                0x0C, 0x05, 0x07,  # unpack sizes: A=5 (unbound), B=7
                0x00,  # end unpack info
                0x00,  # end streams info
            ]
        )
        counts, sizes = _read_streams_info(_Reader(si))
        assert counts == [1] and sizes == [5]

    def test_zero_substream_folder_contributes_no_sizes(self):
        from tlmc_etl_spark.operators.sevenzip import (
            _Reader,
            _read_streams_info,
        )

        si = bytes(
            [
                0x06, 0x00, 0x01, 0x09, 0x07, 0x00,
                0x07, 0x0B, 0x01, 0x00,
                0x01, 0x01, 0x00,  # 1 coder, Copy
                0x0C, 0x07,
                0x00,
                0x08,  # substreams info
                0x0D, 0x00,  # numUnpackStreams = [0]
                0x09,  # kSize: nothing follows for a 0-count folder
                0x00, 0x00,  # end substreams, end streams
            ]
        )
        counts, sizes = _read_streams_info(_Reader(si))
        assert counts == [0] and sizes == []

    def test_archive_properties_section_is_skipped(self):
        """7zFormat.txt allows optional ArchiveProperties before the
        main streams — a conformant archive carrying one must list."""
        enc = bytearray(encode_7z([("f.txt", False, b"hello")]))
        off, size = header_span(bytes(enc[:32]))
        # splice kArchiveProperties { type=0x37, size=2, data } + kEnd
        # right after the kHeader byte
        props = bytes([0x02, 0x37, 0x02, 0xAB, 0xCD, 0x00])
        new_header = bytes([enc[off]]) + props + bytes(enc[off + 1 : off + size])
        new_start = struct.pack(
            "<QQI", off - 32, len(new_header), zlib.crc32(new_header)
        )
        out = (
            bytes(enc[:8]) + struct.pack("<I", zlib.crc32(new_start))
            + new_start + bytes(enc[32:off]) + new_header
        )
        idx = parse_7z_index(out)
        assert [(e["path"], e["size"]) for e in idx] == [("f.txt", 5)]

    def test_file_variant_matches_and_skips_payload(self):
        """parse_7z_index_file must agree with the bytes parse while
        reading only header ranges — never the payload."""
        from tests.conftest import ByteCountingReader

        from tlmc_etl_spark.operators.sevenzip import parse_7z_index_file

        big = [("big.bin", False, bytes(200_000)), ("d", True, None)]
        for codec in ("copy", "lzma"):
            enc = encode_7z(big, header_codec=codec)
            fh = ByteCountingReader(enc)
            assert parse_7z_index_file(fh) == parse_7z_index(enc)
            assert fh.bytes_read < 2000, f"{codec}: read {fh.bytes_read}"

    def test_crafted_pack_size_raises_value_error_not_oom(self):
        """A CRC-valid end header declaring an encoded-header pack size
        of 2^63 must raise ValueError from the file variant — not
        OverflowError/MemoryError from an unbounded read (the bytes
        variant is safe by slicing)."""
        import io

        from tlmc_etl_spark.operators.sevenzip import (
            _LZMA1_PROPS,
            _streams_info,
            _write_number,
            parse_7z_index_file,
        )

        folder = (
            _write_number(1) + bytes([0x23])
            + b"\x03\x01\x01" + _write_number(len(_LZMA1_PROPS))
            + _LZMA1_PROPS
        )
        end_header = bytes([0x17]) + _streams_info(
            0, [1 << 63], [folder], [64], None
        )
        start = struct.pack(
            "<QQI", 0, len(end_header), zlib.crc32(end_header)
        )
        blob = (
            b"7z\xbc\xaf\x27\x1c" + bytes([0, 4])
            + struct.pack("<I", zlib.crc32(start)) + start + end_header
        )
        with pytest.raises(ValueError):
            parse_7z_index_file(io.BytesIO(blob))
        with pytest.raises(ValueError):
            parse_7z_index(blob)

    def test_substream_overrun_raises(self):
        # solid archive: shrink the folder unpack size under the
        # declared substreams and the parse must refuse
        enc = encode_7z([("a", False, b"12345"), ("b", False, b"678")],
                        header_codec="copy", solid=True)
        idx = parse_7z_index(enc)
        assert [e["size"] for e in idx] == [5, 3]


class TestSevenZipExtraction:
    """extract_7z_members: the Extract stage's payload step in-container
    (Copy/LZMA1/LZMA2 folders; filter chains stay the child-process
    boundary)."""

    def test_all_layout_combinations_roundtrip(self):
        import itertools

        from tlmc_etl_spark.operators.sevenzip import (
            encode_7z,
            extract_7z_members,
            parse_7z_index,
        )

        payload_a = b"hello archive world" * 9
        payload_b = bytes(range(256)) * 5
        for hc, pc, solid, crcs in itertools.product(
            ("copy", "lzma"), ("copy", "lzma"), (False, True), (False, True)
        ):
            arc = encode_7z(
                [("dir", True, None), ("a.txt", False, payload_a),
                 ("b/b.bin", False, payload_b), ("empty.txt", False, b"")],
                header_codec=hc, payload_codec=pc, solid=solid,
                with_crcs=crcs,
            )
            out = extract_7z_members(arc)
            assert [e["path"] for e in out] == [
                e["path"] for e in parse_7z_index(arc)
            ]
            got = {e["path"]: e for e in out}
            assert got["dir"]["content"] is None
            assert got["a.txt"]["content"] == payload_a
            assert got["b/b.bin"]["content"] == payload_b
            assert got["empty.txt"]["content"] == b""
            expect_ok = True if crcs else None
            assert got["a.txt"]["crc_ok"] is expect_ok, (hc, pc, solid, crcs)

    def test_filter_chain_layouts_roundtrip(self):
        # the BCJ x86 / Delta folder chains `7z a -mf=...` writes: two
        # coders + a bind pair, decoded through one stdlib FORMAT_RAW
        # chain (xz ships the identical transforms). The BCJ payload
        # carries real E8 rel32 call opcodes so the branch converter
        # actually transforms bytes; delta gets a sawtooth that delta
        # coding collapses.
        import itertools

        from tlmc_etl_spark.operators.sevenzip import (
            encode_7z,
            extract_7z_members,
            parse_7z_index,
        )

        x86ish = b"".join(
            b"\x90\x50\xe8" + (i * 16).to_bytes(4, "little") + b"\x58\xc3"
            for i in range(200)
        )
        sawtooth = bytes((i * 3) % 251 for i in range(2048))
        for codec, payload in (("lzma+bcj", x86ish), ("lzma+delta", sawtooth)):
            for solid, crcs in itertools.product((False, True), (False, True)):
                arc = encode_7z(
                    [("a.bin", False, payload), ("b.txt", False, b"plain" * 40)],
                    payload_codec=codec, solid=solid, with_crcs=crcs,
                )
                # the LISTING never decodes payloads — sizes must be right
                assert [e["size"] for e in parse_7z_index(arc)] == [
                    len(payload), 200
                ]
                got = {e["path"]: e for e in extract_7z_members(arc)}
                assert got["a.bin"]["content"] == payload, (codec, solid, crcs)
                assert got["b.txt"]["content"] == b"plain" * 40
                if crcs:
                    assert got["a.bin"]["crc_ok"] is True

    def test_delta_chain_against_independent_delta_encoder(self):
        # differential: hand-implement the delta ENCODER (out[i] =
        # in[i] - in[i-dist], the xz/7z Delta definition), compress the
        # hand-encoded bytes with plain LZMA1, and the engine's chain
        # decode of a [LZMA1, Delta] folder must reproduce the ORIGINAL
        # payload — stdlib's chained delta decode is cross-checked
        # against an implementation it has never seen.
        import lzma

        from tlmc_etl_spark.operators.sevenzip import (
            _CODEC_DELTA,
            _CODEC_LZMA1,
            _LZMA1_FILTER,
            _LZMA1_PROPS,
            _decode_chain,
        )

        dist = 2
        payload = bytes((7 * i + (i >> 3)) % 256 for i in range(4096))
        hand_delta = bytearray(payload)
        for i in range(len(payload) - 1, dist - 1, -1):
            hand_delta[i] = (payload[i] - payload[i - dist]) % 256
        comp = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[_LZMA1_FILTER])
        packed = comp.compress(bytes(hand_delta)) + comp.flush()
        out = _decode_chain(
            [(_CODEC_LZMA1, _LZMA1_PROPS), (_CODEC_DELTA, bytes([dist - 1]))],
            packed,
            len(payload),
        )
        assert out == payload

    def test_filter_chain_corruption_never_silent(self):
        import pytest

        from tlmc_etl_spark.operators.sevenzip import (
            encode_7z,
            extract_7z_members,
        )

        base = encode_7z(
            [("x.bin", False, bytes(range(256)) * 6)],
            payload_codec="lzma+delta", with_crcs=True,
        )
        detected = 0
        for at in range(32, len(base) - 60):
            arc = bytearray(base)
            arc[at] ^= 0xFF
            # "never silent" means: a flip that changes the decoded bytes
            # is caught EITHER by a decode-time ValueError (CRC mismatch
            # raises too) OR by a crc_ok=False report. A crc_ok=False row
            # is detection, not silence — asserting all(crc_ok) inside the
            # try block would turn a detected flip into a test FAILURE
            # (the AssertionError escapes the except ValueError).
            try:
                out = extract_7z_members(bytes(arc))
            except ValueError:
                detected += 1
                continue
            if any(e["crc_ok"] is False for e in out if e["content"]):
                detected += 1
                continue
            # decode succeeded and every content CRC verified: the flip
            # must have been byte-neutral for the decoded content
            assert all(e["crc_ok"] for e in out if e["content"]), (
                f"flip at {at}: decode returned content with unverified CRC"
            )
        assert detected > 0

    def test_reversed_bind_pair_topology_refuses(self, monkeypatch):
        """An untrusted archive can wire a 2-coder folder BACKWARDS
        (packed→filter→LZMA): same codec ids, different bind-pair
        routing. Decoding it with the packed→LZMA→filter chain order
        would return wrong bytes — silently when no CRC table exists —
        so _decode_chain must verify the routing and raise."""
        import pytest

        import tlmc_etl_spark.operators.sevenzip as sz

        # unit level: crafted topology, reversed routing
        topo = {
            "spans": [(0, 1, 0, 1), (1, 1, 1, 1)],  # coder0=LZMA, coder1=Delta
            "bind_pairs": [(0, 1)],  # Delta's OUT feeds LZMA's IN (reversed)
            "packed_idxs": [1],  # packed feeds the Delta filter
        }
        with pytest.raises(ValueError, match="bind pair|packed stream"):
            sz._decode_chain(
                [(sz._CODEC_LZMA1, sz._LZMA1_PROPS), (sz._CODEC_DELTA, b"\x01")],
                b"x", 8, topo,
            )

        # end to end: a full archive whose folder carries the reversed
        # bind pair (no CRC table — the silent-garbage case)
        real_chain_folder = sz._chain_folder

        def reversed_chain_folder(filter_codec, filter_props):
            blob = real_chain_folder(filter_codec, filter_props)
            assert blob.endswith(bytes([1, 0]))  # the (in=1, out=0) pair
            return blob[:-2] + bytes([0, 1])  # rewire to (in=0, out=1)

        monkeypatch.setattr(sz, "_chain_folder", reversed_chain_folder)
        arc = sz.encode_7z(
            [("x.bin", False, bytes(range(256)) * 4)],
            payload_codec="lzma+delta", with_crcs=False,
        )
        with pytest.raises(ValueError, match="bind pair|packed stream"):
            sz.extract_7z_members(arc)

    def test_unsupported_chains_still_refuse(self):
        # AES / stacked-filter folders stay the documented boundary:
        # a 3-coder folder must raise, not decode garbage
        import pytest

        from tlmc_etl_spark.operators.sevenzip import _decode_chain

        with pytest.raises(ValueError, match="unsupported|>2-coder"):
            _decode_chain(
                [(b"\x21", b"\x00"), (b"\x03", b"\x01"), (b"\x03", b"\x01")],
                b"x", 1,
            )
        with pytest.raises(ValueError, match="unsupported"):
            # 2 coders but neither is a known filter (e.g. AES 06f10701)
            _decode_chain(
                [(b"\x21", b"\x00"), (b"\x06\xf1\x07\x01", b"")], b"x", 1
            )

    def test_zero_length_substream_extracts(self):
        # rare but legal: an empty FILE backed by a genuine 0-length
        # SUBSTREAM (inside a solid folder's size table) instead of the
        # usual kEmptyStream+kEmptyFile bits. Extraction pairs pieces by
        # stream membership, so the zero piece is consumed, neighbours
        # stay aligned, and the trailing piece-count guard holds.
        import itertools

        from tlmc_etl_spark.operators.sevenzip import (
            encode_7z,
            extract_7z_members,
        )

        payload_a = b"front payload" * 7
        payload_b = b"back payload" * 11
        for pc, crcs in itertools.product(("copy", "lzma"), (False, True)):
            arc = encode_7z(
                [("a.txt", False, payload_a), ("zero.bin", False, b""),
                 ("b.txt", False, payload_b)],
                payload_codec=pc, solid=True, with_crcs=crcs,
                stream_empty_payloads=True,
            )
            got = {e["path"]: e for e in extract_7z_members(arc)}
            assert got["a.txt"]["content"] == payload_a, (pc, crcs)
            assert got["zero.bin"]["content"] == b""
            assert got["b.txt"]["content"] == payload_b
            if crcs:
                assert got["zero.bin"]["crc_ok"] is True

    def test_payload_corruption_fails_crc(self):
        import pytest

        from tlmc_etl_spark.operators.sevenzip import (
            encode_7z,
            extract_7z_members,
            parse_7z_index,
        )

        arc = bytearray(encode_7z(
            [("x.txt", False, b"A" * 100)], with_crcs=True
        ))
        arc[40] ^= 0xFF  # inside the copy-stored payload
        # the LISTING is untouched (headers only) ...
        assert parse_7z_index(bytes(arc))[0]["size"] == 100
        # ... but extraction must refuse the corrupt payload
        with pytest.raises(ValueError, match="CRC mismatch"):
            extract_7z_members(bytes(arc))

    def test_lzma_payload_corruption_never_silent(self):
        import pytest

        from tlmc_etl_spark.operators.sevenzip import (
            encode_7z,
            extract_7z_members,
        )

        base = encode_7z(
            [("x.bin", False, bytes(range(256)) * 4)],
            payload_codec="lzma", with_crcs=True,
        )
        flips = 0
        for at in range(32, len(base) - 40):
            arc = bytearray(base)
            arc[at] ^= 0xFF
            try:
                out = extract_7z_members(bytes(arc))
                # a surviving parse must still have verified the CRC
                assert all(e["crc_ok"] for e in out if e["content"])
            except ValueError:
                flips += 1
        assert flips > 0  # the payload region is actually covered

    def test_non7z_and_empty(self):
        from tlmc_etl_spark.operators.sevenzip import extract_7z_members

        assert extract_7z_members(None) is None
        assert extract_7z_members(b"PK\x03\x04" + bytes(40)) is None


class TestExtractionExceptionBoundary:
    def test_malformed_but_crc_valid_header_raises_valueerror(self):
        """CRC-valid headers whose structure is inconsistent (e.g. a
        substream kSize with no kCodersUnpackSize to bound it) must
        surface as ValueError from extraction too — the per-row
        isolation contract catches ValueError only."""
        import random

        from tlmc_etl_spark.operators.sevenzip import (
            encode_7z,
            extract_7z_members,
        )

        base = encode_7z(
            [("a.txt", False, b"q" * 80)],
            payload_codec="lzma", with_crcs=True,
        )
        rnd = random.Random(11)
        rejected = 0
        for _ in range(300):
            arc = bytearray(base)
            arc[rnd.randrange(len(arc))] ^= 1 << rnd.randrange(8)
            try:
                extract_7z_members(bytes(arc))
            except ValueError:
                rejected += 1  # the ONLY allowed failure type
        assert rejected > 0
