"""In-container 7z archive-index parse: signature + end-header walk,
no payload extraction, stdlib only.

The reference's entry stage shells out `7z l -slt` per archive and
parses the text listing (Preprocessor/Extract/extract_plan.py:84-116);
operators/archive.py keeps that subprocess shape for the process-UDF
surface. This module removes the tool dependency for the index scan
itself: the .7z container format is publicly documented (7zFormat.txt,
shipped with every 7-Zip source release) and the only codec a header
needs is LZMA, which the Python stdlib exposes as a raw decoder — so
the names/sizes/attributes listing is buildable in-container, the same
boundary move operators/flac.py made for FLAC.

Follows the flac.py pattern: a spec-built writer (`encode_7z`) so plans
can synthesize conformant payloads, hand-pinned byte layouts in tests
(not a self-consistent encode/decode loop), and ValueError — never
IndexError/struct.error or a silently wrong listing — on torn headers.
Both header CRC32s are verified.

Scale shape: the parse touches ONLY the 32-byte signature header and
the end header (`header_span` returns the tail byte range from the
first 32 bytes), so an object-store reader lists a multi-GB archive
with two range reads — O(header), not O(archive). In-plan, one archive
parses inside a single task and `mapInPandas` batches many archives per
task (plans/multimodal.py:archive_index_scan).
"""

from __future__ import annotations

import lzma
import struct
import zlib

_SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# Property ids (7zFormat.txt "Property IDs")
_K_END = 0x00
_K_HEADER = 0x01
_K_ARCHIVE_PROPS = 0x02
_K_ADDITIONAL_STREAMS = 0x03
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS_INFO = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_CODERS_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_MTIME = 0x14
_K_WIN_ATTRIB = 0x15
_K_ENCODED_HEADER = 0x17

_CODEC_COPY = b"\x00"
_CODEC_LZMA1 = b"\x03\x01\x01"
_CODEC_LZMA2 = b"\x21"
_CODEC_DELTA = b"\x03"
_CODEC_BCJ_X86 = b"\x03\x03\x01\x03"

_FILETIME_EPOCH_S = 11644473600  # 1601-01-01 -> 1970-01-01
_ATTR_DIRECTORY = 0x10


# ---------------------------------------------------------------------------
# Number coding (7zFormat.txt "REAL_UINT64"): the first byte's leading
# set bits count the extra little-endian bytes; the remaining low bits
# are the value's high part.
# ---------------------------------------------------------------------------


def _write_number(n: int) -> bytes:
    if n < 0:
        raise ValueError("7z: negative number")
    if n < 0x80:
        return bytes([n])
    # the full 8-extra-byte form is always a valid encoding
    return b"\xff" + struct.pack("<Q", n)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("7z: header truncated")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def byte(self) -> int:
        return self.bytes(1)[0]

    def number(self) -> int:
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not first & mask:
                return value | (first & (mask - 1)) << (8 * i)
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bit_vector(self, n: int) -> list[bool]:
        raw = self.bytes((n + 7) // 8)
        return [bool(raw[i // 8] & (0x80 >> (i % 8))) for i in range(n)]

    def defined_vector(self, n: int) -> list[bool]:
        all_defined = self.byte()
        return [True] * n if all_defined else self.bit_vector(n)


# ---------------------------------------------------------------------------
# Writer (test double, same role as encode_flac): stored (Copy) payload
# streams — one folder per file, or one solid folder with a substream
# table — and a plain or LZMA-compressed end header.
# ---------------------------------------------------------------------------

_LZMA1_FILTER = {
    "id": lzma.FILTER_LZMA1, "dict_size": 1 << 16, "lc": 3, "lp": 0, "pb": 2,
}
# props blob: lc/lp/pb byte + 4-byte LE dict size (LZMA SDK layout)
_LZMA1_PROPS = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack("<I", 1 << 16)


def _bit_vector_bytes(flags: list[bool]) -> bytes:
    raw = bytearray((len(flags) + 7) // 8)
    for i, f in enumerate(flags):
        if f:
            raw[i // 8] |= 0x80 >> (i % 8)
    return bytes(raw)


def _copy_folder() -> bytes:
    # one coder, Copy codec, no attributes: flags byte = id size 1
    return _write_number(1) + bytes([0x01]) + _CODEC_COPY


def _lzma1_folder() -> bytes:
    # one coder, LZMA1, with the 5-byte props blob
    return (
        _write_number(1) + bytes([0x20 | len(_CODEC_LZMA1)]) + _CODEC_LZMA1
        + _write_number(len(_LZMA1_PROPS)) + _LZMA1_PROPS
    )


def _chain_folder(filter_codec: bytes, filter_props: bytes) -> bytes:
    """Two-coder folder: LZMA1 feeding a branch/delta filter (the layout
    `7z a -mf=Delta/-mf=BCJ` writes). Decode order: packed → LZMA1⁻¹ →
    filter⁻¹; the bind pair routes LZMA's out (out-index 0) into the
    filter's in (in-index 1), leaving the filter's out as the folder
    output (NumBindPairs and packed indexes are implied per
    7zFormat.txt when the counts are 1)."""
    out = bytearray(_write_number(2))
    out += bytes([0x20 | len(_CODEC_LZMA1)]) + _CODEC_LZMA1
    out += _write_number(len(_LZMA1_PROPS)) + _LZMA1_PROPS
    flags = len(filter_codec) | (0x20 if filter_props else 0)
    out += bytes([flags]) + filter_codec
    if filter_props:
        out += _write_number(len(filter_props)) + filter_props
    out += _write_number(1) + _write_number(0)  # the one bind pair
    return bytes(out)


# encode-order stdlib filter chains per payload_codec (the filter runs
# FIRST on encode, so decode inverts it last — liblzma chain semantics)
_DELTA_DIST = 2
_PAYLOAD_CHAINS = {
    "lzma": [_LZMA1_FILTER],
    "lzma+delta": [{"id": lzma.FILTER_DELTA, "dist": _DELTA_DIST}, _LZMA1_FILTER],
    "lzma+bcj": [{"id": lzma.FILTER_X86}, _LZMA1_FILTER],
}


def _streams_info(pack_pos: int, pack_sizes: list[int], folders: list[bytes],
                  unpack_sizes: list[int],
                  substreams: list[list[int]] | None,
                  sub_crcs: list[int] | None = None) -> bytes:
    out = bytearray([_K_PACK_INFO])
    out += _write_number(pack_pos) + _write_number(len(pack_sizes))
    out += bytes([_K_SIZE])
    for s in pack_sizes:
        out += _write_number(s)
    out += bytes([_K_END])
    out += bytes([_K_UNPACK_INFO, _K_FOLDER])
    out += _write_number(len(folders)) + bytes([0x00])  # not external
    for f in folders:
        out += f
    out += bytes([_K_CODERS_UNPACK_SIZE])
    for s in unpack_sizes:
        out += _write_number(s)
    out += bytes([_K_END])
    if substreams is not None or sub_crcs is not None:
        out += bytes([_K_SUBSTREAMS_INFO])
        if substreams is not None:
            out += bytes([_K_NUM_UNPACK_STREAM])
            for sizes in substreams:
                out += _write_number(len(sizes))
            out += bytes([_K_SIZE])
            for sizes in substreams:
                for s in sizes[:-1]:  # last substream size is implied
                    out += _write_number(s)
        if sub_crcs is not None:
            # no folder CRCs are written, so every substream digest is
            # present and defined (7zFormat.txt digest-elision rule)
            out += bytes([_K_CRC, 0x01])  # allDefined
            for c in sub_crcs:
                out += struct.pack("<I", c)
        out += bytes([_K_END, _K_END])
    else:
        out += bytes([_K_END])
    return bytes(out)


def encode_7z(entries: list[tuple[str, bool, bytes | None]],
              header_codec: str = "copy", solid: bool = False,
              mtime_unix: int | None = None,
              payload_codec: str = "copy",
              with_crcs: bool = False,
              stream_empty_payloads: bool = False) -> bytes:
    """Entries [(path, is_dir, payload)] → conformant .7z bytes.

    File payloads are stored with the Copy coder or (payload_codec=
    'lzma') compressed per folder with LZMA1 — one folder per file, or
    (solid=True) one folder whose substream table carries the sizes,
    the layout real solid archives use. with_crcs plants the substream
    CRC32 digest table extraction verifies against. header_codec picks
    how the end header itself is stored: 'copy' = plain kHeader,
    'lzma' = LZMA1 kEncodedHeader (what `7z a` writes by default)."""
    if header_codec not in ("copy", "lzma"):
        raise ValueError("7z: header_codec must be 'copy' or 'lzma'")
    if payload_codec not in ("copy", "lzma", "lzma+delta", "lzma+bcj"):
        raise ValueError(
            "7z: payload_codec must be copy|lzma|lzma+delta|lzma+bcj"
        )
    files = [(p, d, b"" if data is None else bytes(data))
             for p, d, data in entries]
    # stream_empty_payloads plants the rare-but-legal layout where an
    # empty FILE is backed by a genuine 0-length SUBSTREAM instead of a
    # kEmptyStream+kEmptyFile bit pair (extraction must consume a piece
    # for it — pairing is by stream membership, not by size)
    payloads = [
        data for _, is_dir, data in files
        if not is_dir and (data or stream_empty_payloads)
    ]

    def _pack(raw: bytes) -> bytes:
        if payload_codec == "copy":
            return raw
        comp = lzma.LZMACompressor(
            format=lzma.FORMAT_RAW, filters=_PAYLOAD_CHAINS[payload_codec]
        )
        return comp.compress(raw) + comp.flush()

    if payload_codec == "copy":
        folder_bytes = _copy_folder()
    elif payload_codec == "lzma":
        folder_bytes = _lzma1_folder()
    elif payload_codec == "lzma+delta":
        folder_bytes = _chain_folder(_CODEC_DELTA, bytes([_DELTA_DIST - 1]))
    else:
        folder_bytes = _chain_folder(_CODEC_BCJ_X86, b"")
    # out-stream sizes per folder: a chain folder declares BOTH coder
    # outputs (filters are size-preserving, so both equal the raw size)
    n_outs = 2 if payload_codec.startswith("lzma+") else 1

    # ----- streams info for the file payloads
    n_payload = len(payloads)
    main_streams = b""
    if n_payload:
        sizes = [len(p) for p in payloads]
        crcs = [zlib.crc32(p) for p in payloads] if with_crcs else None
        if solid:
            raw = b"".join(payloads)
            body = _pack(raw)
            main_streams = bytes([_K_MAIN_STREAMS]) + _streams_info(
                0, [len(body)], [folder_bytes], [len(raw)] * n_outs,
                [sizes], crcs
            )
        else:
            packs = [_pack(p) for p in payloads]
            body = b"".join(packs)
            main_streams = bytes([_K_MAIN_STREAMS]) + _streams_info(
                0, [len(p) for p in packs], [folder_bytes] * n_payload,
                [s for sz in sizes for s in [sz] * n_outs],
                None if not with_crcs else [[sz] for sz in sizes], crcs
            )
    else:
        body = b""

    # ----- files info
    n = len(files)
    empty_stream = [
        is_dir or (not data and not stream_empty_payloads)
        for _, is_dir, data in files
    ]
    empty_file = [not is_dir for (_, is_dir, data), es
                  in zip(files, empty_stream) if es]
    fi = bytearray([_K_FILES_INFO]) + _write_number(n)
    if any(empty_stream):
        es_bytes = _bit_vector_bytes(empty_stream)
        fi += bytes([_K_EMPTY_STREAM]) + _write_number(len(es_bytes))
        fi += es_bytes
        if any(empty_file):
            ef_bytes = _bit_vector_bytes(empty_file)
            fi += bytes([_K_EMPTY_FILE]) + _write_number(len(ef_bytes))
            fi += ef_bytes
    names = bytearray([0x00])  # not external
    for p, _, _ in files:
        names += p.encode("utf-16-le") + b"\x00\x00"
    fi += bytes([_K_NAME]) + _write_number(len(names)) + bytes(names)
    if mtime_unix is not None:
        ft = (mtime_unix + _FILETIME_EPOCH_S) * 10_000_000
        times = bytes([1, 0]) + struct.pack("<Q", ft) * n  # all defined
        fi += bytes([_K_MTIME]) + _write_number(len(times)) + times
    attribs = bytearray([1, 0])  # all defined, not external
    for _, is_dir, _ in files:
        attribs += struct.pack("<I", _ATTR_DIRECTORY if is_dir else 0x20)
    fi += bytes([_K_WIN_ATTRIB]) + _write_number(len(attribs)) + bytes(attribs)
    fi += bytes([_K_END])

    header = bytes([_K_HEADER]) + main_streams + bytes(fi) + bytes([_K_END])

    if header_codec == "lzma":
        comp = lzma.LZMACompressor(
            format=lzma.FORMAT_RAW, filters=[_LZMA1_FILTER]
        )
        packed_header = comp.compress(header) + comp.flush()
        folder = (
            _write_number(1) + bytes([0x20 | len(_CODEC_LZMA1)])
            + _CODEC_LZMA1 + _write_number(len(_LZMA1_PROPS)) + _LZMA1_PROPS
        )
        end_header = bytes([_K_ENCODED_HEADER]) + _streams_info(
            len(body), [len(packed_header)], [folder], [len(header)], None
        )
        body += packed_header
    else:
        end_header = header

    out = bytearray(_SIGNATURE) + bytes([0, 4])
    start = struct.pack(
        "<QQI", len(body), len(end_header), zlib.crc32(end_header)
    )
    out += struct.pack("<I", zlib.crc32(start)) + start
    out += body + end_header
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def header_span(head: bytes) -> tuple[int, int] | None:
    """First 32 bytes → (absolute offset, size) of the end header, or
    None for non-7z input; ValueError on a torn/CRC-bad start header.
    The range an object-store reader fetches to list without reading
    the payload."""
    if head is None or len(head) < 6 or head[:6] != _SIGNATURE:
        return None
    if len(head) < 32:
        raise ValueError("7z: truncated signature header")
    start_crc = struct.unpack("<I", head[8:12])[0]
    if zlib.crc32(head[12:32]) != start_crc:
        raise ValueError("7z: start header CRC mismatch")
    offset, size = struct.unpack("<QQ", head[12:28])
    return 32 + offset, size


def _decode_folder_stream(r: _Reader, fetch, base: int) -> bytes:
    """StreamsInfo (as written for an encoded header: one folder, one
    pack stream) → the folder's decoded bytes. Supports the codecs a
    real header folder uses: Copy, LZMA1, LZMA2. `fetch(start, size)`
    returns archive bytes — a slice for in-memory parses, a seek+read
    for the range-read file parse."""
    pack_pos = None
    pack_sizes: list[int] = []
    coders: list[tuple[bytes, bytes]] = []
    bound_out: set[int] = set()
    unpack_sizes: list[int] = []
    while True:
        prop = r.number()
        if prop == _K_END:
            break
        if prop == _K_PACK_INFO:
            pack_pos = r.number()
            n_pack = r.number()
            while True:
                sub = r.number()
                if sub == _K_END:
                    break
                if sub == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(n_pack)]
                elif sub == _K_CRC:
                    _read_crcs(r, n_pack)
                else:
                    raise ValueError(f"7z: unexpected pack property {sub}")
        elif prop == _K_UNPACK_INFO:
            if r.number() != _K_FOLDER:
                raise ValueError("7z: unpack info missing folder")
            n_folders = r.number()
            if n_folders != 1:
                raise ValueError("7z: encoded header must be one folder")
            if r.byte():
                raise ValueError("7z: external folder data unsupported")
            coders, n_out, bound_out, _n_packed, _topo = _read_folder(r)
            while True:
                sub = r.number()
                if sub == _K_END:
                    break
                if sub == _K_CODERS_UNPACK_SIZE:
                    unpack_sizes = [r.number() for _ in range(n_out)]
                elif sub == _K_CRC:
                    _read_crcs(r, 1)
                else:
                    raise ValueError(f"7z: unexpected unpack property {sub}")
        else:
            raise ValueError(f"7z: unexpected header stream property {prop}")
    if pack_pos is None or not pack_sizes or not coders or not unpack_sizes:
        raise ValueError("7z: encoded header streams info incomplete")
    if len(coders) != 1:
        raise ValueError("7z: multi-coder header folders unsupported")
    packed = fetch(base + pack_pos, pack_sizes[0])
    if len(packed) < pack_sizes[0]:
        raise ValueError("7z: packed header overruns the archive")
    return _decode_coder(
        coders[0], packed, _folder_output_size(unpack_sizes, bound_out)
    )


def _folder_output_size(sizes: list[int], bound_out: set[int]) -> int:
    """A folder's output is its out stream NOT consumed by any bind
    pair (7zFormat.txt folder layout; filter chains like BCJ+LZMA put
    the unbound stream first, not last)."""
    unbound = [i for i in range(len(sizes)) if i not in bound_out]
    if len(unbound) != 1:
        raise ValueError(
            f"7z: folder has {len(unbound)} unbound output streams"
        )
    return sizes[unbound[0]]


def _lzma_filter_spec(codec: bytes, props: bytes) -> dict:
    """Stdlib filter dict for a 7z compression coder (LZMA1/LZMA2)."""
    if codec == _CODEC_LZMA1:
        if len(props) != 5:
            raise ValueError("7z: bad LZMA properties size")
        p = props[0]
        if p >= 9 * 5 * 5:
            raise ValueError("7z: bad LZMA properties byte")
        lc, rem = p % 9, p // 9
        lp, pb = rem % 5, rem // 5
        return {
            "id": lzma.FILTER_LZMA1,
            "dict_size": max(4096, struct.unpack("<I", props[1:5])[0]),
            "lc": lc, "lp": lp, "pb": pb,
        }
    if codec == _CODEC_LZMA2:
        if len(props) != 1:
            raise ValueError("7z: bad LZMA2 properties size")
        p = props[0]
        if p > 40:
            raise ValueError("7z: bad LZMA2 dictionary size byte")
        # LZMA2 props byte: 40 = 4 GiB-1, else (2 | p&1) << (p//2 + 11)
        dict_size = (1 << 32) - 1 if p == 40 else (2 | (p & 1)) << (p // 2 + 11)
        return {"id": lzma.FILTER_LZMA2, "dict_size": dict_size}
    raise ValueError(f"7z: unsupported compression codec {codec.hex()}")


def _branch_filter_spec(codec: bytes, props: bytes) -> dict:
    """Stdlib filter dict for a 7z branch/delta filter coder — the
    non-encumbered filter chains (xz ships the identical transforms, so
    stdlib lzma decodes them natively in a FORMAT_RAW chain)."""
    if codec == _CODEC_DELTA:
        if len(props) != 1:
            raise ValueError("7z: bad delta properties size")
        return {"id": lzma.FILTER_DELTA, "dist": props[0] + 1}
    if codec == _CODEC_BCJ_X86:
        if props:
            raise ValueError("7z: BCJ x86 start offsets unsupported")
        return {"id": lzma.FILTER_X86}
    raise ValueError(f"7z: unsupported filter codec {codec.hex()}")


def _decode_coder(coder: tuple[bytes, bytes], packed: bytes,
                  unpack_size: int) -> bytes:
    codec, props = coder
    if codec == _CODEC_COPY:
        if len(packed) != unpack_size:
            raise ValueError("7z: copy stream size mismatch")
        return packed
    filters = [_lzma_filter_spec(codec, props)]
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filters)
    try:
        # 7z LZMA streams carry no end marker: the unpack size bounds
        # the read, so cap the output instead of expecting EOS
        out = dec.decompress(packed, max_length=unpack_size)
    except lzma.LZMAError as e:
        raise ValueError(f"7z: corrupt header stream: {e}") from e
    if len(out) != unpack_size:
        raise ValueError("7z: header decoded short")
    return out


def _decode_chain(coders: list[tuple[bytes, bytes]], packed: bytes,
                  unpack_size: int, topo: dict | None = None) -> bytes:
    """Decode a folder's coder chain: one compression coder, optionally
    composed with ONE branch/delta filter (the BCJ x86 / Delta layouts
    `7z a -mf=...` writes). The whole chain runs through a single stdlib
    FORMAT_RAW decompressor — decode order packed → LZMA⁻¹ → filter⁻¹ is
    exactly liblzma's chain semantics. AES and multi-filter chains stay
    the documented boundary (ValueError).

    `topo` (from _read_folder) pins the BIND-PAIR ROUTING, not just the
    codec ids: the packed stream must feed the COMPRESSION coder and the
    bind pair must route the compression coder's output into the filter.
    An archive wired the other way (packed→filter→LZMA) would otherwise
    decode in the wrong order and — with no CRC table — return wrong
    bytes silently (crc_ok None) instead of raising."""
    if len(coders) == 1:
        return _decode_coder(coders[0], packed, unpack_size)
    if len(coders) != 2:
        raise ValueError("7z: >2-coder folders unsupported for extraction")
    comp = [c for c in coders if c[0] in (_CODEC_LZMA1, _CODEC_LZMA2)]
    filt = [c for c in coders if c[0] in (_CODEC_DELTA, _CODEC_BCJ_X86)]
    if len(comp) != 1 or len(filt) != 1:
        raise ValueError(
            "7z: unsupported coder chain "
            f"{[c[0].hex() for c in coders]} (AES / stacked filters stay "
            "the child-process boundary)"
        )
    if topo is not None:
        ci = coders.index(comp[0])
        fi = coders.index(filt[0])
        spans = topo["spans"]

        def _owner(idx: int, which: str) -> int:
            for k, (i0, ni, o0, no) in enumerate(spans):
                lo, n = (i0, ni) if which == "in" else (o0, no)
                if lo <= idx < lo + n:
                    return k
            raise ValueError(f"7z: bind/packed {which}-index {idx} out of range")

        if len(topo["bind_pairs"]) != 1 or len(topo["packed_idxs"]) != 1:
            raise ValueError("7z: filtered folder must have 1 bind pair + 1 packed stream")
        b_in, b_out = topo["bind_pairs"][0]
        if _owner(b_out, "out") != ci or _owner(b_in, "in") != fi:
            raise ValueError(
                "7z: bind pair does not route compressor output into the "
                "filter (reversed/exotic folder wiring unsupported)"
            )
        if _owner(topo["packed_idxs"][0], "in") != ci:
            raise ValueError(
                "7z: packed stream does not feed the compression coder "
                "(reversed/exotic folder wiring unsupported)"
            )
    filters = [
        _branch_filter_spec(*filt[0]),
        _lzma_filter_spec(*comp[0]),
    ]
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filters)
    try:
        out = dec.decompress(packed, max_length=unpack_size)
    except lzma.LZMAError as e:
        raise ValueError(f"7z: corrupt filtered stream: {e}") from e
    if len(out) != unpack_size:
        raise ValueError("7z: filtered stream decoded short")
    return out


def _read_folder(
    r: _Reader,
) -> tuple[list[tuple[bytes, bytes]], int, set[int], int, dict]:
    """One folder → ([(codec_id, props)], total out streams, the set of
    out-stream indexes consumed by bind pairs, the folder's packed-
    stream count, and the folder TOPOLOGY: per-coder in/out stream
    spans, the bind pairs' (in, out) index routing, and the packed
    in-stream indexes. The topology is what _decode_chain verifies —
    codec ids alone cannot distinguish packed→LZMA→filter from a
    reversed (hostile or exotic) packed→filter→LZMA wiring, and with no
    CRC table a wrongly-ordered decode would return garbage silently."""
    n_coders = r.number()
    if not 1 <= n_coders <= 64:
        raise ValueError("7z: implausible coder count")
    coders = []
    spans = []  # per coder: (in_start, n_in, out_start, n_out)
    total_in = 0
    total_out = 0
    for _ in range(n_coders):
        flags = r.byte()
        id_size = flags & 0x0F
        codec = r.bytes(id_size)
        n_in = n_out = 1
        if flags & 0x10:  # complex coder
            n_in = r.number()
            n_out = r.number()
        props = b""
        if flags & 0x20:
            props = r.bytes(r.number())
        coders.append((codec, props))
        spans.append((total_in, n_in, total_out, n_out))
        total_in += n_in
        total_out += n_out
    n_bind = total_out - 1
    bound_out: set[int] = set()
    bound_in: set[int] = set()
    bind_pairs: list[tuple[int, int]] = []
    for _ in range(n_bind):
        in_idx = r.number()
        out_idx = r.number()  # out index: consumed internally
        bind_pairs.append((in_idx, out_idx))
        bound_in.add(in_idx)
        bound_out.add(out_idx)
    n_packed = total_in - n_bind
    if n_packed > 1:
        packed_idxs = [r.number() for _ in range(n_packed)]
    else:
        # single packed stream: by 7zFormat.txt it is the one in-stream
        # no bind pair consumes
        packed_idxs = [i for i in range(total_in) if i not in bound_in]
    topo = {"spans": spans, "bind_pairs": bind_pairs, "packed_idxs": packed_idxs}
    return coders, total_out, bound_out, n_packed, topo


def _read_crcs(r: _Reader, n: int) -> list[int | None]:
    defined = r.defined_vector(n)
    return [struct.unpack("<I", r.bytes(4))[0] if d else None
            for d in defined]


def _read_streams_info(
    r: _Reader, collect: dict | None = None
) -> tuple[list[int], list[int]]:
    """MainStreamsInfo → (num substreams per folder, substream sizes) —
    the per-file size table, which is all an index listing needs. With
    `collect`, also captures what EXTRACTION needs: pack position/sizes,
    per-folder coder chains, folder unpack sizes, and the per-substream
    CRC32 table (folder CRCs fill 1-substream folders per 7zFormat.txt's
    digest-elision rule)."""
    folder_out_sizes: list[int] = []  # main unpack size per folder
    folder_crc_defined: list[bool] = []
    folder_crcs: list[int | None] = []
    folder_meta: list[tuple] = []
    sub_digests: list[int | None] | None = None
    n_folders = 0
    num_unpack: list[int] | None = None
    sub_sizes: list[int] | None = None
    while True:
        prop = r.number()
        if prop == _K_END:
            break
        if prop == _K_PACK_INFO:
            pack_pos = r.number()
            n_pack = r.number()
            if collect is not None:
                collect["pack_pos"] = pack_pos
            while True:
                sub = r.number()
                if sub == _K_END:
                    break
                if sub == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(n_pack)]
                    if collect is not None:
                        collect["pack_sizes"] = pack_sizes
                elif sub == _K_CRC:
                    _read_crcs(r, n_pack)
                else:
                    raise ValueError(f"7z: unexpected pack property {sub}")
        elif prop == _K_UNPACK_INFO:
            if r.number() != _K_FOLDER:
                raise ValueError("7z: unpack info missing folder")
            n_folders = r.number()
            if n_folders > 1 << 24:
                raise ValueError("7z: implausible folder count")
            if r.byte():
                raise ValueError("7z: external folder data unsupported")
            folder_meta = [_read_folder(r) for _ in range(n_folders)]
            while True:
                sub = r.number()
                if sub == _K_END:
                    break
                if sub == _K_CODERS_UNPACK_SIZE:
                    folder_out_sizes = []
                    for _, n_out, bound_out, _np, _topo in folder_meta:
                        sizes = [r.number() for _ in range(n_out)]
                        folder_out_sizes.append(
                            _folder_output_size(sizes, bound_out)
                        )
                elif sub == _K_CRC:
                    folder_crcs = _read_crcs(r, n_folders)
                    folder_crc_defined = [c is not None for c in folder_crcs]
                else:
                    raise ValueError(f"7z: unexpected unpack property {sub}")
        elif prop == _K_SUBSTREAMS_INFO:
            num_unpack = None
            sub_sizes = None
            while True:
                sub = r.number()
                if sub == _K_END:
                    break
                if sub == _K_NUM_UNPACK_STREAM:
                    num_unpack = [r.number() for _ in range(n_folders)]
                elif sub == _K_SIZE:
                    counts = num_unpack or [1] * n_folders
                    sub_sizes = []
                    for fi, cnt in enumerate(counts):
                        if cnt == 0:
                            continue  # zero-substream folder: no sizes
                        got = [r.number() for _ in range(cnt - 1)]
                        rest = folder_out_sizes[fi] - sum(got)
                        if rest < 0:
                            raise ValueError(
                                "7z: substream sizes exceed folder size"
                            )
                        sub_sizes.extend(got + [rest])
                elif sub == _K_CRC:
                    # digests cover only substreams whose CRC is not
                    # already known: a 1-substream folder with a defined
                    # folder CRC contributes none
                    counts = num_unpack or [1] * n_folders
                    known = folder_crc_defined or [False] * n_folders
                    n_digests = sum(
                        0 if cnt == 1 and known[fi] else cnt
                        for fi, cnt in enumerate(counts)
                    )
                    sub_digests = _read_crcs(r, n_digests)
                else:
                    raise ValueError(
                        f"7z: unexpected substream property {sub}"
                    )
        else:
            raise ValueError(f"7z: unexpected streams property {prop}")
    counts = num_unpack if num_unpack is not None else [1] * n_folders
    if sub_sizes is None:
        sub_sizes = []
        for fi, cnt in enumerate(counts):
            if cnt == 1:
                sub_sizes.append(folder_out_sizes[fi])
            elif cnt != 0:
                raise ValueError("7z: substream counts without sizes")
    if collect is not None:
        # full per-substream CRC table: folders whose single substream
        # is covered by the folder CRC contribute it; others take the
        # next digest (None when undefined)
        known = folder_crc_defined or [False] * n_folders
        fcrcs = folder_crcs or [None] * n_folders
        digests = list(sub_digests or [])
        sub_crcs: list[int | None] = []
        for fi, cnt in enumerate(counts):
            if cnt == 1 and known[fi]:
                sub_crcs.append(fcrcs[fi])
            else:
                for _ in range(cnt):
                    sub_crcs.append(digests.pop(0) if digests else None)
        collect["folders"] = folder_meta
        collect["folder_out_sizes"] = folder_out_sizes
        collect["counts"] = counts
        collect["sub_sizes"] = sub_sizes
        collect["sub_crcs"] = sub_crcs
    return counts, sub_sizes


def parse_7z_index(data: bytes | None) -> list[dict] | None:
    """.7z bytes → [{path, is_dir, size, attrib, mtime_unix}] with no
    payload extraction — the in-container `7z l -slt` for the entry
    stage. None for non-7z input; ValueError (never IndexError or
    struct.error, and never a silently short listing) on torn or
    CRC-corrupt headers. Entry order is the archive's own; backslash
    separators are normalized to '/' the way the reference's -slt parse
    does (extract_plan.py:99-116)."""
    try:
        span = header_span(data[:32] if data else data)
        if span is None:
            return None
        off, size = span
        if off + size > len(data):
            raise ValueError("7z: end header overruns the archive")
        if size == 0:
            return []  # empty archive: no header, no entries
        return _parse_end_header(
            data[off : off + size],
            struct.unpack("<I", data[28:32])[0],
            lambda s, n: data[s : s + n],
        )
    except (IndexError, struct.error) as e:
        raise ValueError(f"7z: truncated or corrupt header: {e}") from e


def parse_7z_index_file(fh) -> list[dict] | None:
    """Range-read variant of parse_7z_index over a seekable binary
    file: reads the 32-byte signature header, the end header, and (for
    encoded headers) the packed header stream — never the payload. The
    listing I/O shape a 100 TB entry stage wants: O(header) bytes per
    archive regardless of archive size."""
    head = fh.read(32)
    try:
        span = header_span(head)
        if span is None:
            return None
        off, size = span
        fh.seek(0, 2)
        file_len = fh.tell()
        if off + size > file_len:
            raise ValueError("7z: end header overruns the archive")
        if size == 0:
            return []
        fh.seek(off)
        end_header = fh.read(size)
        if len(end_header) < size:
            raise ValueError("7z: end header truncated")

        def fetch(s: int, n: int) -> bytes:
            # bound BEFORE seeking/reading: a corrupt (or crafted,
            # CRC32 is not tamper-proof) encoded-header pack size must
            # raise ValueError, not OverflowError/MemoryError from an
            # unbounded read
            if s < 0 or n < 0 or s + n > file_len:
                raise ValueError("7z: packed header overruns the archive")
            fh.seek(s)
            return fh.read(n)

        return _parse_end_header(
            end_header, struct.unpack("<I", head[28:32])[0], fetch
        )
    except (IndexError, struct.error) as e:
        raise ValueError(f"7z: truncated or corrupt header: {e}") from e


def _parse_end_header(end_header: bytes, expect_crc: int, fetch,
                      collect: dict | None = None) -> list[dict]:
    if zlib.crc32(end_header) != expect_crc:
        raise ValueError("7z: end header CRC mismatch")
    r = _Reader(end_header)
    kind = r.number()
    if kind == _K_ENCODED_HEADER:
        r = _Reader(_decode_folder_stream(r, fetch, 32))
        kind = r.number()
    if kind != _K_HEADER:
        raise ValueError(f"7z: unexpected top-level property {kind}")
    return _parse_header_body(r, collect)


def _parse_header_body(r: _Reader, collect: dict | None = None) -> list[dict]:
    sub_counts: list[int] = []
    sub_sizes: list[int] = []
    entries: list[dict] = []
    while True:
        prop = r.number()
        if prop == _K_END:
            break
        if prop == _K_ARCHIVE_PROPS:
            # optional (type, size, data) list, terminated by type 0
            while True:
                t = r.number()
                if t == _K_END:
                    break
                r.bytes(r.number())
        elif prop == _K_ADDITIONAL_STREAMS:
            _read_streams_info(r)  # optional; parse and discard
        elif prop == _K_MAIN_STREAMS:
            sub_counts, sub_sizes = _read_streams_info(r, collect)
        elif prop == _K_FILES_INFO:
            entries = _parse_files_info(r, sub_sizes, collect)
        else:
            raise ValueError(f"7z: unexpected header property {prop}")
    return entries


def _parse_files_info(
    r: _Reader, sub_sizes: list[int], collect: dict | None = None
) -> list[dict]:
    n = r.number()
    if n > 1 << 24:
        raise ValueError("7z: implausible file count")
    empty_stream = [False] * n
    empty_file: list[bool] = []
    names: list[str] | None = None
    attribs: list[int | None] = [None] * n
    mtimes: list[int | None] = [None] * n
    while True:
        prop = r.number()
        if prop == _K_END:
            break
        size = r.number()
        body = _Reader(r.bytes(size))
        if prop == _K_EMPTY_STREAM:
            empty_stream = body.bit_vector(n)
        elif prop == _K_EMPTY_FILE:
            empty_file = body.bit_vector(sum(empty_stream))
        elif prop == _K_NAME:
            if body.byte():
                raise ValueError("7z: external names unsupported")
            raw = body.bytes(size - 1)
            if len(raw) % 2:
                raise ValueError("7z: odd-length name data")
            try:
                joined = raw.decode("utf-16-le")
            except UnicodeDecodeError as e:
                raise ValueError(f"7z: undecodable names: {e}") from e
            if not joined.endswith("\x00"):
                raise ValueError("7z: unterminated name table")
            names = joined[:-1].split("\x00")
        elif prop == _K_WIN_ATTRIB:
            defined = body.defined_vector(n)
            if body.byte():
                raise ValueError("7z: external attributes unsupported")
            for i, d in enumerate(defined):
                if d:
                    attribs[i] = struct.unpack("<I", body.bytes(4))[0]
        elif prop == _K_MTIME:
            defined = body.defined_vector(n)
            if body.byte():
                raise ValueError("7z: external times unsupported")
            for i, d in enumerate(defined):
                if d:
                    ft = struct.unpack("<Q", body.bytes(8))[0]
                    mtimes[i] = ft // 10_000_000 - _FILETIME_EPOCH_S
        # other properties (kDummy padding, comments, anti flags, start
        # positions) are skipped by their declared size
    if names is None or len(names) != n:
        raise ValueError("7z: file names missing or miscounted")
    n_streams = n - sum(empty_stream)
    if len(sub_sizes) != n_streams:
        raise ValueError(
            f"7z: {n_streams} stream files but {len(sub_sizes)} substreams"
        )
    if collect is not None:
        # extraction pairs decoded substreams with entries by STREAM
        # MEMBERSHIP (the kEmptyStream vector), never by size — a
        # genuine 0-length substream is rare but legal
        collect["empty_stream"] = empty_stream
    out = []
    stream_i = 0
    empty_i = 0
    for i in range(n):
        if empty_stream[i]:
            is_empty_file = bool(empty_file) and empty_file[empty_i]
            empty_i += 1
            is_dir = not is_empty_file
            size = 0
        else:
            is_dir = False
            size = sub_sizes[stream_i]
            stream_i += 1
        attr = attribs[i]
        if attr is not None and attr & _ATTR_DIRECTORY:
            is_dir = True
        out.append({
            "path": names[i].replace("\\", "/").rstrip("/"),
            "is_dir": is_dir,
            "size": size,
            "attrib": attr,
            "mtime_unix": mtimes[i],
        })
    return out


def extract_7z_members(data: bytes | None) -> list[dict] | None:
    """Full in-container extraction: the listing entries of
    parse_7z_index plus a `content` bytes field (None for directories,
    b"" for empty files), decoded with the stdlib coders the index walk
    already uses for encoded headers — Copy, LZMA1, LZMA2 — and
    CRC32-verified against the substream digest table when the archive
    carries one (`crc_ok` True when verified, None when the table is
    absent; a mismatch raises rather than returning False). This is the
    reference Extract stage's payload step (extract_plan.py runs
    `7z x`) for the folder shapes those coders cover; folders using
    filter chains (BCJ/delta) or AES raise ValueError — the documented
    child-process boundary, same stance as the MP3 PCM lane. None for
    non-7z input; ValueError on torn folders, short packs, or a CRC
    mismatch (never a silently wrong payload)."""
    try:
        return _extract_7z_members(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"7z: truncated or corrupt header: {e}") from e


def _extract_7z_members(data: bytes | None) -> list[dict] | None:
    span = header_span(data[:32] if data else data)
    if span is None:
        return None
    off, size = span
    if off + size > len(data):
        raise ValueError("7z: end header overruns the archive")
    if size == 0:
        return []
    streams: dict = {}
    entries = _parse_end_header(
        data[off : off + size],
        struct.unpack("<I", data[28:32])[0],
        lambda s0, n0: data[s0 : s0 + n0],
        collect=streams,
    )
    folders = streams.get("folders", [])
    if not folders:
        for e in entries:
            e["content"] = None if e["is_dir"] else b""
            e["crc_ok"] = None
        return entries
    pack_sizes = streams.get("pack_sizes", [])
    if sum(np for _, _, _, np, _t in folders) != len(pack_sizes):
        raise ValueError("7z: pack streams do not match folder consumption")
    base = 32 + streams.get("pack_pos", 0)
    # decode every folder, slice its substreams, verify digests
    pieces: list[bytes] = []
    piece_crc_ok: list[bool | None] = []
    pack_at = base
    si = 0
    sub_sizes = streams["sub_sizes"]
    sub_crcs = streams["sub_crcs"]
    if len(streams.get("folder_out_sizes", [])) != len(folders):
        raise ValueError("7z: folder unpack sizes missing or miscounted")
    for fi, (coders, _n_out, _bound, n_packed, topo) in enumerate(folders):
        if n_packed != 1:
            raise ValueError(
                "7z: multi-pack-stream folders unsupported for extraction"
            )
        psize = pack_sizes[fi]
        if pack_at + psize > len(data):
            raise ValueError("7z: packed stream overruns the archive")
        raw = _decode_chain(
            coders, data[pack_at : pack_at + psize],
            streams["folder_out_sizes"][fi], topo,
        )
        pack_at += psize
        at = 0
        for _ in range(streams["counts"][fi]):
            piece = raw[at : at + sub_sizes[si]]
            at += sub_sizes[si]
            crc = sub_crcs[si]
            ok = None if crc is None else zlib.crc32(piece) == crc
            if ok is False:
                raise ValueError(
                    f"7z: substream {si} CRC mismatch after decode"
                )
            pieces.append(piece)
            piece_crc_ok.append(ok)
            si += 1
    # Pair pieces with entries by STREAM MEMBERSHIP, not size: an entry
    # outside the kEmptyStream vector consumes exactly one substream even
    # when that substream is a legal 0-length one (size == 0 alone cannot
    # distinguish it from an empty-stream kEmptyFile entry, which is not
    # backed by a piece).
    empty_stream = streams.get("empty_stream", [False] * len(entries))
    pi = 0
    for i, e in enumerate(entries):
        backed = i < len(empty_stream) and not empty_stream[i]
        if backed:
            e["content"] = pieces[pi]
            e["crc_ok"] = piece_crc_ok[pi]
            pi += 1
        else:
            e["content"] = None if e["is_dir"] else b""
            e["crc_ok"] = None
    if pi != len(pieces):
        raise ValueError("7z: decoded substreams exceed stream files")
    return entries
