"""RAR archive-index parse (operators/rarindex.py): RAR 4.x and 5.0
header walks, stdlib-only, listing without decompression.

Trust chain (flac.py pattern): the RAR5 vint codec and a complete
minimal RAR5 archive are HAND-ASSEMBLED from the published rarlab
technote layout — literal bytes, not encoder output — pinning the
parser's byte layout; writer round-trips cover the wider shapes. An
opt-in real-unrar/7z cross-check would live in test_real_tools.py if
those tools existed in a container.
"""

import struct
import zlib

import numpy as np
import pytest

from tlmc_etl_spark.operators.rarindex import (
    _read_vint,
    _write_vint,
    encode_rar4,
    encode_rar5,
    parse_rar_index,
)

ENTRIES = [
    ("Album 1", True, None),
    ("Album 1/01 track.flac", False, b"fLaC" * 40),
    ("Album 1/cover.jpg", False, b"\xff\xd8" * 5),
    ("empty.txt", False, b""),
]


class TestVintCodec:
    @pytest.mark.parametrize(
        "raw,want",
        [
            (b"\x00", 0),
            (b"\x7f", 0x7F),
            (b"\x80\x01", 0x80),
            (b"\xff\x7f", 0x3FFF),
            (b"\xac\x02", 300),
        ],
    )
    def test_hand_pinned_reads(self, raw, want):
        assert _read_vint(raw, 0) == (want, len(raw))

    def test_roundtrip(self):
        rng = np.random.default_rng(31)
        for v in [0, 1, 127, 128, 16383, 16384, 2**32] + [
            int(x) for x in rng.integers(0, 2**60, 20)
        ]:
            assert _read_vint(_write_vint(v), 0)[0] == v

    def test_truncated_vint_raises(self):
        with pytest.raises(ValueError, match="vint"):
            _read_vint(b"\x80", 0)


def _hand_rar5() -> bytes:
    """A complete RAR5 archive assembled from the technote layout —
    independent of encode_rar5. Main header, one stored 4-byte file
    'a', end header."""

    def block(fields: bytes, data: bytes = b"") -> bytes:
        hdr = bytes([len(fields)]) + fields  # size vint (fits 1 byte)
        return struct.pack("<I", zlib.crc32(hdr)) + hdr + data

    main = block(bytes([0x01, 0x00, 0x00]))  # type=1 flags=0 archflags=0
    file_fields = bytes(
        [
            0x02,  # type: file
            0x02,  # header flags: data area present
            0x04,  # data size = 4
            0x00,  # file flags
            0x04,  # unpacked size = 4
            0x20,  # attributes
            0x00,  # compression info: store
            0x00,  # host OS
            0x01,  # name length
        ]
    ) + b"a"
    file_blk = block(file_fields, b"DATA")
    end = block(bytes([0x05, 0x00, 0x00]))
    return b"Rar!\x1a\x07\x01\x00" + main + file_blk + end


class TestHandBuiltRar5:
    def test_hand_pinned_layout_parses(self):
        idx = parse_rar_index(_hand_rar5())
        assert idx == [
            {"path": "a", "is_dir": False, "size": 4, "attrib": 0x20,
             "mtime_unix": None}
        ]

    def test_header_crc_checked(self):
        data = bytearray(_hand_rar5())
        data[30] ^= 0x01  # inside the file header
        with pytest.raises(ValueError, match="CRC"):
            parse_rar_index(bytes(data))


class TestRoundTrip:
    def test_rar5_full_shape(self):
        idx = parse_rar_index(encode_rar5(ENTRIES, mtime_unix=1_700_000_000))
        assert [(e["path"], e["is_dir"], e["size"]) for e in idx] == [
            (p, d, 0 if data is None else len(data)) for p, d, data in ENTRIES
        ]
        assert all(e["mtime_unix"] == 1_700_000_000 for e in idx)

    def test_rar4_full_shape(self):
        idx = parse_rar_index(encode_rar4(ENTRIES))
        assert [(e["path"], e["is_dir"], e["size"]) for e in idx] == [
            (p, d, 0 if data is None else len(data)) for p, d, data in ENTRIES
        ]
        assert all(e["mtime_dos"] == 0x5B0F6C3D for e in idx)

    def test_rar5_unicode_names(self):
        idx = parse_rar_index(encode_rar5([("東方/曲.flac", False, b"x")]))
        assert idx[0]["path"] == "東方/曲.flac"

    def test_rar4_names_are_ascii_only(self):
        with pytest.raises(UnicodeEncodeError):
            encode_rar4([("東方.flac", False, b"x")])


class TestFileVariant:
    def test_file_walk_matches_and_seeks_past_payload(self):
        """parse_rar_index_file must agree with the bytes parse while
        SEEKING past data areas — header bytes only."""
        from tests.conftest import ByteCountingReader

        from tlmc_etl_spark.operators.rarindex import parse_rar_index_file

        big = [("big.bin", False, bytes(200_000)), ("d", True, None)]
        for enc in (encode_rar5(big, mtime_unix=5), encode_rar4(big)):
            fh = ByteCountingReader(enc)
            assert parse_rar_index_file(fh) == parse_rar_index(enc)
            assert fh.bytes_read < 500, f"read {fh.bytes_read} bytes"

    def test_huge_declared_sizes_raise_value_error_not_overflow(self):
        """Corrupt/hostile size fields must surface as ValueError, not
        MemoryError (unbounded read preallocation) or OverflowError
        (seek past C ssize_t): the header-size vint precedes CRC
        coverage, and data sizes are CRC-protected but unbounded."""
        from tlmc_etl_spark.operators.rarindex import _write_vint

        # 1) torn size vint decoding to 2^62 before any CRC check
        blob = (
            b"Rar!\x1a\x07\x01\x00" + bytes(4) + _write_vint(1 << 62)
        )
        with pytest.raises(ValueError):
            parse_rar_index(blob)
        # 2) CRC-valid rar5 block declaring a 2^63+5 data area
        def block(fields: bytes) -> bytes:
            hdr = _write_vint(len(fields)) + fields
            return struct.pack("<I", zlib.crc32(hdr)) + hdr

        main = block(bytes([0x01, 0x00, 0x00]))
        huge = block(
            bytes([0x02, 0x02]) + _write_vint((1 << 63) + 5)
            + _write_vint(0) + _write_vint(4) + _write_vint(0x20)
            + bytes([0x00, 0x00, 0x01]) + b"x"
        )
        with pytest.raises(ValueError):
            parse_rar_index(b"Rar!\x1a\x07\x01\x00" + main + huge)
        # 3) CRC-valid rar4 block with HIGH_PACK_SIZE pushing add_size
        # past 2^63
        body = struct.pack(
            "<IIBIIBBHI", 0xFFFFFFFF, 4, 2, 0, 0, 20, 0x30, 1, 0x20
        ) + struct.pack("<II", 0xFFFFFFFF, 0) + b"x"
        hdr = bytes([0x74]) + struct.pack("<HH", 0x8100, 7 + len(body)) + body
        crc = zlib.crc32(hdr) & 0xFFFF
        blob4 = b"Rar!\x1a\x07\x00" + struct.pack("<H", crc) + hdr
        with pytest.raises(ValueError):
            parse_rar_index(blob4)

    def test_truncated_data_area_raises_in_file_walk(self):
        import io

        from tlmc_etl_spark.operators.rarindex import parse_rar_index_file

        for enc in (encode_rar5(ENTRIES, mtime_unix=1), encode_rar4(ENTRIES)):
            # cut inside the first file's data area
            cut = enc[: len(enc) - 120]
            with pytest.raises(ValueError):
                parse_rar_index_file(io.BytesIO(cut))

    def test_rar5_unknown_size_flag_reports_none(self):
        """File flag 0x0008 = unpacked size unknown (stream input): the
        size field is a placeholder and must NOT be summed as bytes."""
        from tlmc_etl_spark.operators.rarindex import _write_vint

        def block(fields: bytes, data: bytes = b"") -> bytes:
            hdr = _write_vint(len(fields)) + fields
            return struct.pack("<I", zlib.crc32(hdr)) + hdr + data

        main = block(bytes([0x01, 0x00, 0x00]))
        file_fields = (
            bytes([0x02, 0x02, 0x04])  # type file, data present, 4 bytes
            + _write_vint(0x0008)  # file flags: size unknown
            + _write_vint(0xFFFFFFFF)  # placeholder unpacked size
            + _write_vint(0x20)
            + bytes([0x00, 0x00, 0x01]) + b"s"
        )
        end = block(bytes([0x05, 0x00, 0x00]))
        enc = (
            b"Rar!\x1a\x07\x01\x00" + main + block(file_fields, b"DATA")
            + end
        )
        idx = parse_rar_index(enc)
        assert idx[0]["path"] == "s" and idx[0]["size"] is None


class TestStrictness:
    def test_non_archive_is_none(self):
        assert parse_rar_index(None) is None
        assert parse_rar_index(b"") is None
        assert parse_rar_index(b"CORRUPT not an archive") is None
        assert parse_rar_index(b"PK\x03\x04" + bytes(30)) is None

    def test_rar5_every_truncation_raises(self):
        """RAR5 mandates an end-of-archive block, so EVERY proper
        prefix is detectable: zero silent short listings."""
        enc = encode_rar5(ENTRIES, mtime_unix=1)
        for cut in range(8, len(enc)):
            with pytest.raises(ValueError):
                parse_rar_index(enc[:cut])

    def test_rar4_truncation_raises_except_block_boundaries(self):
        """4.x ENDARC is optional, so a cut landing EXACTLY between
        blocks is indistinguishable from a complete archive — every
        other cut must raise."""
        enc = encode_rar4(ENTRIES)
        silent = 0
        for cut in range(7, len(enc)):
            try:
                parse_rar_index(enc[:cut])
                silent += 1
            except ValueError:
                pass
        # one boundary per block: main + 4 files (the end-block cut IS
        # the full archive, not a prefix)
        assert silent == 5

    def test_byte_corruption_never_leaks(self):
        for enc in (encode_rar5(ENTRIES, mtime_unix=1), encode_rar4(ENTRIES)):
            want = parse_rar_index(enc)
            rng = np.random.default_rng(37)
            for _ in range(200):
                pos = int(rng.integers(0, len(enc)))
                torn = bytearray(enc)
                torn[pos] ^= 1 << int(rng.integers(8))
                try:
                    got = parse_rar_index(bytes(torn))
                except ValueError:
                    continue
                assert got is None or got == want

    def test_random_blobs_never_leak(self):
        rng = np.random.default_rng(41)
        for sig in (b"Rar!\x1a\x07\x00", b"Rar!\x1a\x07\x01\x00"):
            for _ in range(200):
                blob = sig + bytes(
                    rng.integers(0, 256, size=int(rng.integers(0, 100)),
                                 dtype=np.uint8)
                )
                try:
                    parse_rar_index(blob)
                except ValueError:
                    pass


def _entry_trees():
    """Hypothesis strategy: arbitrary archive trees — ascii-safe names
    (the RAR4 lowest common denominator), dirs, empty and non-empty
    files, duplicate-free paths."""
    from hypothesis import strategies as st

    name = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ._-[]",
        min_size=1, max_size=20,
    ).filter(lambda s: s.strip(" .") == s)
    entry = st.tuples(
        name, st.booleans(), st.binary(min_size=0, max_size=200)
    )
    return st.lists(entry, min_size=1, max_size=8, unique_by=lambda e: e[0])


class TestPropertyRoundTrip:
    """Any entry tree stored in any of the four containers must list
    identically — the property generalization of TestDispatch."""

    def test_any_tree_lists_identically_across_containers(self):
        from hypothesis import HealthCheck, given, settings

        from tlmc_etl_spark.operators.archive import parse_archive_index
        from tlmc_etl_spark.operators.sevenzip import encode_7z
        from tlmc_etl_spark.operators.zipindex import encode_zip

        @settings(max_examples=60, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(_entry_trees())
        def check(tree):
            entries = [(p, d, None if d else data) for p, d, data in tree]
            want = [(p, d, 0 if d else len(data or b""))
                    for p, d, data in entries]
            blobs = [
                encode_7z(entries, header_codec="copy"),
                encode_7z(entries, header_codec="lzma", solid=True),
                encode_zip(entries),
                encode_zip(entries, zip64=True),
                encode_rar5(entries, mtime_unix=1),
                encode_rar4(entries),
            ]
            for blob in blobs:
                got = [(e["path"], e["is_dir"], e["size"])
                       for e in parse_archive_index(blob)]
                assert got == want

        check()


class TestDispatch:
    def test_magic_dispatch_covers_all_formats(self):
        from tlmc_etl_spark.operators.archive import parse_archive_index
        from tlmc_etl_spark.operators.sevenzip import encode_7z
        from tlmc_etl_spark.operators.zipindex import encode_zip

        asc = [(p, d, x) for p, d, x in ENTRIES]
        blobs = [
            encode_7z(asc, header_codec="lzma"),
            encode_zip(asc),
            encode_rar5(asc),
            encode_rar4(asc),
        ]
        listings = [
            [(e["path"], e["is_dir"], e["size"])
             for e in parse_archive_index(b)]
            for b in blobs
        ]
        # the SAME tree through four container formats yields the SAME
        # listing
        assert listings[0] == listings[1] == listings[2] == listings[3]
        assert parse_archive_index(b"not an archive") is None


class TestRarExtraction:
    """extract_rar_members: STORED members slice + verify in-container;
    compressed members return a reason instead of raising (the RAR
    codec is proprietary — the child-process lane owns that decode)."""

    def test_stored_roundtrip_both_generations(self):
        from tlmc_etl_spark.operators.rarindex import (
            encode_rar4,
            encode_rar5,
            extract_rar_members,
        )

        pay = b"stored payload bytes " * 8
        for arc, crc_expect in (
            (encode_rar5([("a.txt", False, pay), ("d", True, None)],
                         with_crcs=True), True),
            (encode_rar5([("a.txt", False, pay)]), None),  # no digest
            (encode_rar4([("a.txt", False, pay)]), True),  # always has one
        ):
            out = extract_rar_members(arc)
            got = {e["path"]: e for e in out}
            assert got["a.txt"]["content"] == pay
            assert got["a.txt"]["crc_ok"] is crc_expect
            assert got["a.txt"]["reason"] is None

    def test_payload_flip_fails_crc(self):
        import pytest

        from tlmc_etl_spark.operators.rarindex import (
            encode_rar5,
            extract_rar_members,
            parse_rar_index,
        )

        pay = b"Z" * 64
        arc = bytearray(encode_rar5([("a.txt", False, pay)], with_crcs=True))
        # the stored payload is the final 64 bytes before the end block
        flip_at = bytes(arc).rindex(pay) + 10
        arc[flip_at] ^= 0xFF
        assert parse_rar_index(bytes(arc))[0]["size"] == 64  # listing ok
        with pytest.raises(ValueError, match="CRC mismatch"):
            extract_rar_members(bytes(arc))

    def test_compressed_member_is_reasoned_not_raised(self):
        import struct

        from tlmc_etl_spark.operators.rarindex import (
            encode_rar4,
            extract_rar_members,
        )

        arc = bytearray(encode_rar4([("a.txt", False, b"x" * 30)]))
        # METHOD sits at body offset 18 (pack4+unp4+host1+crc4+time4+ver1)
        # = 7 bytes before the name; re-stamp the header CRC after
        name_pos = bytes(arc).find(b"a.txt")
        arc[name_pos - 7] = 0x33  # 0x30 store -> 0x33 "normal"
        import zlib
        blk = name_pos - 25 - 7
        hsize = struct.unpack_from("<H", arc, blk + 5)[0]
        crc = zlib.crc32(bytes(arc[blk + 2 : blk + hsize])) & 0xFFFF
        struct.pack_into("<H", arc, blk, crc)
        out = extract_rar_members(bytes(arc))
        assert out[0]["content"] is None
        assert out[0]["reason"] == "rar compression unsupported"

    def test_refusal_per_family_rar4_compressed(self):
        # proprietary LZSS/PPMd lane: every 4.x method 0x31-0x35 refuses
        # with the documented reason; stored siblings still extract
        from tlmc_etl_spark.operators.rarindex import (
            encode_rar4,
            extract_rar_members,
        )

        for method in (0x31, 0x32, 0x33, 0x34, 0x35):
            arc = encode_rar4(
                [("c.bin", False, b"\x00" * 16), ("s.txt", False, b"ok")],
                method=method,
            )
            # method applies to every member in this double — build a
            # second stored archive to prove coexistence instead
            out = extract_rar_members(arc)
            assert out[0]["reason"] == "rar compression unsupported"
            assert out[0]["content"] is None and out[0]["crc_ok"] is None

    def test_refusal_per_family_rar5_compressed(self):
        from tlmc_etl_spark.operators.rarindex import (
            encode_rar5,
            extract_rar_members,
        )

        for method in (1, 2, 3, 4, 5):
            arc = encode_rar5([("c.bin", False, b"\x00" * 16)], method=method)
            out = extract_rar_members(arc)
            assert out[0]["reason"] == "rar compression unsupported"
            assert out[0]["content"] is None

    def test_refusal_per_family_rar5_encrypted(self):
        # AES-256 file-encryption extra record: refused as encryption,
        # NOT misread as stored (the ciphertext must never be returned)
        from tlmc_etl_spark.operators.rarindex import (
            encode_rar5,
            extract_rar_members,
            parse_rar_index,
        )

        arc = encode_rar5(
            [("sec.bin", False, b"\xde\xad" * 8)], encrypted=True
        )
        assert parse_rar_index(arc)[0]["path"] == "sec.bin"  # listing works
        out = extract_rar_members(arc)
        assert out[0]["reason"] == "rar encryption unsupported"
        assert out[0]["content"] is None

    def test_refusal_per_family_rar4_encrypted(self):
        from tlmc_etl_spark.operators.rarindex import (
            encode_rar4,
            extract_rar_members,
        )

        arc = encode_rar4([("sec.bin", False, b"\xde\xad" * 8)], encrypted=True)
        out = extract_rar_members(arc)
        assert out[0]["reason"] == "rar encryption unsupported"
        assert out[0]["content"] is None

    def test_stored_members_alongside_refused_still_extract(self):
        # ONE archive, mixed families, refused members FIRST: a
        # compressed and an encrypted data area both precede the stored
        # member, so its slice offset must account for every skipped
        # payload — the realistic mixed layout, not per-archive isolation
        from tlmc_etl_spark.operators.rarindex import (
            encode_rar5,
            extract_rar_members,
        )

        arc = encode_rar5(
            [
                ("comp.bin", False, b"\x55" * 37),
                ("sec.bin", False, b"\x01" * 19),
                ("ok.txt", False, b"fine"),
            ],
            with_crcs=True,
            method={"comp.bin": 3},
            encrypted={"sec.bin"},
        )
        got = {e["path"]: e for e in extract_rar_members(arc)}
        assert got["comp.bin"]["reason"] == "rar compression unsupported"
        assert got["sec.bin"]["reason"] == "rar encryption unsupported"
        assert got["ok.txt"]["content"] == b"fine"
        assert got["ok.txt"]["crc_ok"] is True

    def test_crafted_extra_size_overlapping_fields_is_torn_not_misread(self):
        # an attacker controls the header CRC (it's plain CRC32 over
        # bytes they write), so a hostile extra_size that makes the
        # 'extra area' alias the name/body fields VALIDATES — extraction
        # must refuse the header as torn rather than walk field bytes as
        # extra records (which could spuriously mark a stored member
        # encrypted and withhold valid content)
        import struct
        import zlib

        from tlmc_etl_spark.operators.rarindex import (
            _SIG_RAR5,
            _rar5_block,
            _write_vint,
            encode_rar5,
            extract_rar_members,
        )

        base = encode_rar5([("ok.txt", False, b"fine")], with_crcs=True)
        # rebuild the FILE block with flag 0x0001 and extra_size spanning
        # the whole remaining header (no real extra records appended)
        sig = len(_SIG_RAR5)
        main = _rar5_block(1, _write_vint(0))  # type 1 = MAIN, flags 0
        file_block_at = sig + len(main)
        # parse the original file block to splice: crc(4) + size vint
        want = base[file_block_at:]
        size_len = 1
        while want[4 + size_len - 1] & 0x80:
            size_len += 1
        hsize = want[4 : 4 + size_len]
        size = 0
        for i, b in enumerate(hsize):
            size |= (b & 0x7F) << (7 * i)
        hdr = bytearray(want[4 + size_len : 4 + size_len + size])
        # hdr = [htype=2][hflags][data_size vint][file fields...]
        assert hdr[0] == 2 and hdr[1] == 0x02  # FILE, data-flag only
        hdr[1] = 0x03  # + extra-area flag
        hacked = bytes([hdr[0], hdr[1]]) + _write_vint(size) + bytes(hdr[2:])
        # extra_size vint = claim the whole header; CRC re-stamped
        new_hdr = _write_vint(len(hacked)) + hacked
        block = struct.pack("<I", zlib.crc32(new_hdr)) + new_hdr
        arc = base[:file_block_at] + block + b"fine" + base[file_block_at + 4 + size_len + size + 4:]
        import pytest

        with pytest.raises(ValueError):
            extract_rar_members(bytes(arc))

    def test_non_rar(self):
        from tlmc_etl_spark.operators.rarindex import extract_rar_members

        assert extract_rar_members(None) is None
        assert extract_rar_members(b"PK\x03\x04" + bytes(30)) is None
