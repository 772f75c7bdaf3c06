"""ZIP archive-index parse (operators/zipindex.py): EOCD scan +
central-directory walk, stdlib-only, no extraction.

Trust chain: unlike the 7z/RAR siblings, ZIP has an in-container
independent implementation — stdlib `zipfile` — so the
encode<->parse self-consistency loop is broken WITHOUT external tools:
our parser reads stdlib-written (deflated) archives and stdlib reads
our spec-built ones, in the same suite.
"""

import io
import struct
import zipfile

import numpy as np
import pytest

from tlmc_etl_spark.operators.zipindex import (
    encode_zip,
    eocd_span,
    parse_zip_index,
)

ENTRIES = [
    ("Album 1", True, None),
    ("Album 1/01 track.flac", False, b"fLaC" * 40),
    ("Album 1/東方 cover.jpg", False, b"\xff\xd8" * 5),
    ("empty.txt", False, b""),
]


class TestRoundTrip:
    @pytest.mark.parametrize("zip64", [False, True])
    def test_full_shape(self, zip64):
        idx = parse_zip_index(encode_zip(ENTRIES, zip64=zip64))
        assert [(e["path"], e["is_dir"], e["size"]) for e in idx] == [
            (p, d, 0 if data is None else len(data)) for p, d, data in ENTRIES
        ]

    def test_backslash_and_trailing_slash_normalized(self):
        idx = parse_zip_index(encode_zip([("top\\sub\\f.txt", False, b"x")]))
        assert idx[0]["path"] == "top/sub/f.txt"
        # a dir stored only via the trailing-slash convention (no DOS
        # attribute bit) must still classify as a directory
        enc = bytearray(encode_zip([("d", True, None)]))
        at = enc.find(b"PK\x01\x02")
        enc[at + 38] = 0  # clear the external-attribute dir bit
        got = parse_zip_index(bytes(enc))
        assert got[0]["is_dir"] and got[0]["path"] == "d"

    def test_dos_mtime_roundtrip(self):
        idx = parse_zip_index(encode_zip([("f", False, b"x")]))
        # the writer plants date 0x5B0F time 0x6C3D
        assert idx[0]["mtime_tuple"] == (2025, 8, 15, 13, 33, 58)


class TestStdlibCrossChecks:
    """The in-suite cross-engine gate (no external tool needed)."""

    @pytest.mark.parametrize("zip64", [False, True])
    def test_stdlib_reads_spec_built_archive(self, zip64):
        zf = zipfile.ZipFile(io.BytesIO(encode_zip(ENTRIES, zip64=zip64)))
        assert zf.testzip() is None
        names = zf.namelist()
        assert "Album 1/01 track.flac" in names and "Album 1/" in names
        info = zf.getinfo("Album 1/01 track.flac")
        assert info.file_size == 160
        assert zf.read("Album 1/01 track.flac") == b"fLaC" * 40

    def test_parse_reads_stdlib_deflated_archive(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("dir/a.txt", b"hello world" * 40)
            zf.writestr("b.bin", bytes(64))
            zf.mkdir("emptydir")
        idx = {e["path"]: e for e in parse_zip_index(buf.getvalue())}
        assert idx["dir/a.txt"]["size"] == 440
        assert not idx["dir/a.txt"]["is_dir"]
        assert idx["b.bin"]["size"] == 64
        assert idx["emptydir"]["is_dir"]

    def test_parse_reads_stdlib_zip64_archive(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
            with zf.open("big.bin", "w", force_zip64=True) as fh:
                fh.write(bytes(1000))
        idx = parse_zip_index(buf.getvalue())
        assert idx[0]["path"] == "big.bin" and idx[0]["size"] == 1000


class TestFileVariant:
    def test_file_variant_matches_and_skips_payload(self):
        """parse_zip_index_file must agree with the bytes parse while
        reading only the tail + central directory."""
        from tests.conftest import ByteCountingReader

        from tlmc_etl_spark.operators.zipindex import parse_zip_index_file

        big = [("big.bin", False, bytes(500_000)), ("d", True, None)]
        for zip64 in (False, True):
            enc = encode_zip(big, zip64=zip64)
            fh = ByteCountingReader(enc)
            assert parse_zip_index_file(fh) == parse_zip_index(enc)
            # payload is 500 KB; the listing must read only the ~64 KB
            # EOCD window + the central directory
            assert fh.bytes_read < 70_000, f"zip64={zip64}: {fh.bytes_read}"

    def test_file_variant_non_zip_and_torn(self):
        import io

        from tlmc_etl_spark.operators.zipindex import parse_zip_index_file

        assert parse_zip_index_file(io.BytesIO(b"CORRUPT bytes")) is None
        enc = encode_zip(ENTRIES)
        cut = enc.find(b"PK\x01\x02")
        with pytest.raises(ValueError):
            parse_zip_index_file(io.BytesIO(enc[:cut]))


class TestEocdSpan:
    def test_span_covers_central_directory(self):
        enc = encode_zip(ENTRIES)
        off, size, n = eocd_span(enc[-100:], len(enc))
        assert n == len(ENTRIES)
        assert enc[off : off + 4] == b"PK\x01\x02"
        cd = enc[off : off + size]
        assert cd.count(b"PK\x01\x02") == len(ENTRIES)

    def test_non_zip_is_none(self):
        assert eocd_span(b"not a zip at all", 16) is None


class TestStrictness:
    def test_non_archive_is_none(self):
        assert parse_zip_index(None) is None
        assert parse_zip_index(b"") is None
        assert parse_zip_index(b"CORRUPT not an archive") is None
        assert parse_zip_index(b"7z\xbc\xaf\x27\x1c" + bytes(32)) is None

    def test_local_header_without_directory_raises(self):
        # a torn download: local headers present, central dir gone
        enc = encode_zip(ENTRIES)
        cut = enc.find(b"PK\x01\x02")
        with pytest.raises(ValueError):
            parse_zip_index(enc[:cut])

    def test_miscounted_directory_raises(self):
        enc = bytearray(encode_zip([("a", False, b"x"), ("b", False, b"y")]))
        # EOCD total-entries field: bump it past the real count
        at = enc.rfind(b"PK\x05\x06")
        enc[at + 10] = 5
        with pytest.raises(ValueError):
            parse_zip_index(bytes(enc))

    def test_byte_corruption_never_leaks(self):
        enc = encode_zip(ENTRIES)
        want = parse_zip_index(enc)
        rng = np.random.default_rng(23)
        for _ in range(250):
            pos = int(rng.integers(0, len(enc)))
            torn = bytearray(enc)
            torn[pos] ^= 1 << int(rng.integers(8))
            try:
                got = parse_zip_index(bytes(torn))
            except ValueError:
                continue
            # payload-byte flips leave the listing intact; flips that
            # break both EOCD magics make it not-a-zip (None); name or
            # size flips still yield a structurally honest listing of
            # the same shape
            assert got is None or len(got) == len(want)

    def test_random_tails_never_leak(self):
        rng = np.random.default_rng(29)
        for _ in range(200):
            blob = bytes(
                rng.integers(0, 256, size=int(rng.integers(0, 80)),
                             dtype=np.uint8)
            ) + b"PK\x05\x06" + bytes(
                rng.integers(0, 256, size=18, dtype=np.uint8)
            )
            try:
                parse_zip_index(blob)
            except ValueError:
                pass


class TestZipExtraction:
    """extract_zip_members: STORED + DEFLATE payload reads through the
    local headers, CRC32/size-verified against the central directory."""

    def test_roundtrip_store_deflate_zip64(self):
        from tlmc_etl_spark.operators.zipindex import (
            encode_zip,
            extract_zip_members,
        )

        pay = b"compress me " * 40
        for method in ("store", "deflate"):
            for z64 in (False, True):
                arc = encode_zip(
                    [("a.txt", False, pay), ("d", True, None),
                     ("b.bin", False, bytes(range(256)))],
                    zip64=z64, method=method,
                )
                out = extract_zip_members(arc)
                got = {e["path"]: e for e in out}
                assert got["a.txt"]["content"] == pay, (method, z64)
                assert got["a.txt"]["crc_ok"] is True
                assert got["d"]["content"] is None
                assert got["b.bin"]["content"] == bytes(range(256))
                # internal bookkeeping fields must not leak
                assert "_method" not in got["a.txt"]

    def test_payload_flips_never_silent(self):
        from tlmc_etl_spark.operators.zipindex import (
            encode_zip,
            extract_zip_members,
        )

        pay = b"Z" * 100
        base = encode_zip([("a.txt", False, pay)], method="deflate")
        import zlib
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        csize = len(c.compress(pay) + c.flush())
        start = 30 + len("a.txt")
        raised = 0
        for at in range(start, start + csize):
            arc = bytearray(base)
            arc[at] ^= 0xFF
            try:
                out = extract_zip_members(bytes(arc))
                assert out[0]["content"] == pay  # only exact survives
            except ValueError:
                raised += 1
        assert raised == csize  # every payload flip was caught

    def test_unsupported_method_raises(self):
        import struct

        import pytest

        from tlmc_etl_spark.operators.zipindex import (
            encode_zip,
            extract_zip_members,
        )

        arc = bytearray(encode_zip([("a.txt", False, b"x" * 10)]))
        # rewrite method 0 -> 12 (bzip2) in BOTH headers
        struct.pack_into("<H", arc, 8, 12)  # local header method
        cd = bytes(arc).find(b"PK\x01\x02")
        struct.pack_into("<H", arc, cd + 10, 12)
        with pytest.raises(ValueError, match="method 12 unsupported"):
            extract_zip_members(bytes(arc))

    def test_non_zip(self):
        from tlmc_etl_spark.operators.zipindex import extract_zip_members

        assert extract_zip_members(None) is None
        assert extract_zip_members(b"7z\xbc\xaf\x27\x1c" + bytes(40)) is None


class TestZip64FieldwiseSentinels:
    """APPNOTE 4.5.3: the ZIP64 extra carries ONLY the sentineled
    fields — an archive may sentinel any subset, so resolution must be
    field-wise, not all-or-nothing (the all-3 assumption rejected valid
    archives whose extra holds fewer than 24 bytes)."""

    def _zip_with_partial_sentinel(self, sentinel_fields):
        import struct
        import zlib

        pay = b"pp" * 30
        crc = zlib.crc32(pay)
        name = b"a.txt"
        usize = csize = len(pay)
        off = 0
        vals = []
        u_f = c_f = o_f = None
        if "usize" in sentinel_fields:
            vals.append(usize); u_f = 0xFFFFFFFF
        if "csize" in sentinel_fields:
            vals.append(csize); c_f = 0xFFFFFFFF
        if "off" in sentinel_fields:
            vals.append(off); o_f = 0xFFFFFFFF
        extra = struct.pack("<HH", 0x0001, 8 * len(vals))
        extra += b"".join(struct.pack("<Q", v) for v in vals)
        local = (b"PK\x03\x04" + struct.pack(
            "<HHHHHIII", 45, 0x0800, 0, 0, 0, crc, csize, usize
        ) + struct.pack("<HH", len(name), 0) + name + pay)
        cen = (b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII", 45, 45, 0x0800, 0, 0, 0, crc,
            c_f if c_f else csize, u_f if u_f else usize,
            len(name), len(extra), 0, 0, 0, 0x20,
            o_f if o_f else off,
        ) + name + extra)
        eocd = b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, 1, 1, len(cen), len(local), 0
        )
        return local + cen + eocd, pay

    def test_each_subset_lists_and_extracts(self):
        from tlmc_etl_spark.operators.zipindex import (
            extract_zip_members,
            parse_zip_index,
        )

        for fields in (["off"], ["usize", "csize"], ["csize"],
                       ["usize", "csize", "off"]):
            arc, pay = self._zip_with_partial_sentinel(fields)
            lst = parse_zip_index(arc)
            assert lst[0]["size"] == len(pay), fields
            out = extract_zip_members(arc)
            assert out[0]["content"] == pay, fields
            assert "_local_off" not in lst[0]  # public shape stays clean
