"""In-container ZIP archive-index parse: end-of-central-directory scan
+ central-directory walk, no payload extraction, stdlib only.

The reference lists `.zip` archives through the same `7z l -slt` child
process as `.7z` (Preprocessor/Extract/extract_plan.py:37
ARCHIVE_EXTENSIONS includes ".zip"; :84-116 the listing call). This is
the ZIP half of the in-container index family (operators/sevenzip.py):
APPNOTE.TXT's central directory is the authoritative listing — names,
sizes, directory bits — and it lives at the END of the file, so the
scale shape is the same two-range read as 7z: `eocd_span` locates the
central directory from the last ~64 KB, then one range read covers
every entry; payload bytes are never touched.

Same contracts as the sibling modules: spec-built writer (`encode_zip`,
stored entries) for test payloads, hand-pinned layouts in tests,
ValueError — never struct.error or a silently short listing — on torn
directories. ZIP64 sizes/counts (the 0x0001 extra field) are parsed.
"""

from __future__ import annotations

import struct
import zlib

_EOCD_SIG = b"PK\x05\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_EOCD64_SIG = b"PK\x06\x06"
_CEN_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"

_DOS_EPOCH = (1980, 1, 1, 0, 0, 0)
_FFFF = 0xFFFF
_FFFFFFFF = 0xFFFFFFFF


def _dos_datetime(dos_date: int, dos_time: int) -> tuple:
    return (
        ((dos_date >> 9) & 0x7F) + 1980,
        (dos_date >> 5) & 0x0F,
        dos_date & 0x1F,
        (dos_time >> 11) & 0x1F,
        (dos_time >> 5) & 0x3F,
        (dos_time & 0x1F) * 2,
    )


def encode_zip(entries: list[tuple[str, bool, bytes | None]],
               zip64: bool = False, method: str = "store") -> bytes:
    """Entries [(path, is_dir, payload)] → conformant .zip bytes with
    STORED (method 0) or (method='deflate') DEFLATED (method 8)
    payloads — raw zlib streams, the layout every real zip writer
    emits. zip64=True writes 0xFFFFFFFF size sentinels with the 0x0001
    extra field (the layout >4 GB archives force), so the reader's
    ZIP64 arm is exercisable on small data."""
    if method not in ("store", "deflate"):
        raise ValueError("zip: method must be 'store' or 'deflate'")
    m_id = 0 if method == "store" else 8
    body = bytearray()
    cen = bytearray()
    n = 0
    for path, is_dir, payload in entries:
        data = b"" if is_dir or payload is None else bytes(payload)
        stored = data
        if m_id == 8 and data:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            stored = c.compress(data) + c.flush()
        name = (path + "/" if is_dir and not path.endswith("/") else path)
        raw = name.encode("utf-8")
        crc = zlib.crc32(data)
        offset = len(body)
        extra = b""
        size_field = len(data)
        csize_field = len(stored)
        off_field = offset
        if zip64:
            extra = struct.pack("<HHQQQ", 0x0001, 24, len(data),
                                len(stored), offset)
            size_field = _FFFFFFFF
            csize_field = _FFFFFFFF
            off_field = _FFFFFFFF
        # general-purpose bit 11: UTF-8 names
        body += _LOCAL_SIG + struct.pack(
            "<HHHHHIII", 45 if zip64 else 20, 0x0800, m_id, 0x6C3D, 0x5B0F,
            crc, csize_field, size_field,
        ) + struct.pack("<HH", len(raw), len(extra)) + raw + extra + stored
        cen += _CEN_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII",
            45, 45 if zip64 else 20, 0x0800, m_id, 0x6C3D, 0x5B0F, crc,
            csize_field, size_field, len(raw), len(extra), 0, 0, 0,
            0x10 if is_dir else 0x20,  # DOS attrs in external low byte
            off_field,
        ) + raw + extra
        n += 1
    cen_off = len(body)
    out = bytes(body) + bytes(cen)
    if zip64:
        eocd64 = _EOCD64_SIG + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0, n, n, len(cen), cen_off
        )
        loc = _EOCD64_LOC_SIG + struct.pack("<IQI", 0, len(out), 1)
        out += eocd64 + loc
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, _FFFF, _FFFF, _FFFFFFFF, _FFFFFFFF, 0
        )
    else:
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, n, n, len(cen), cen_off, 0
        )
    return out


def eocd_span(tail: bytes, file_size: int) -> tuple[int, int, int] | None:
    """The last ~64 KB + EOCD of the file → (central dir offset, size,
    entry count), resolving ZIP64 when the EOCD carries sentinels and
    the ZIP64 records are inside `tail`. None if no EOCD signature is
    present (not a ZIP); ValueError on a torn EOCD. `tail` must end at
    `file_size`."""
    at = tail.rfind(_EOCD_SIG)
    if at < 0:
        return None
    if at + 22 > len(tail):
        raise ValueError("zip: truncated end-of-central-directory")
    (_disk, _cd_disk, n_here, n_total, cd_size, cd_off,
     _clen) = struct.unpack_from("<HHHHIIH", tail, at + 4)
    if n_total == _FFFF or cd_off == _FFFFFFFF or cd_size == _FFFFFFFF:
        base = file_size - len(tail)
        loc_at = tail.rfind(_EOCD64_LOC_SIG, 0, at)
        if loc_at < 0 or loc_at + 20 > len(tail):
            raise ValueError("zip: ZIP64 locator missing or truncated")
        eocd64_abs = struct.unpack_from("<Q", tail, loc_at + 8)[0]
        rel = eocd64_abs - base
        if rel < 0 or rel + 56 > len(tail):
            raise ValueError("zip: ZIP64 EOCD outside the tail window")
        if tail[rel : rel + 4] != _EOCD64_SIG:
            raise ValueError("zip: bad ZIP64 EOCD signature")
        (_sz, _vmade, _vneed, _d1, _d2, _n_here64, n_total64, cd_size64,
         cd_off64) = struct.unpack_from("<QHHIIQQQQ", tail, rel + 4)
        return cd_off64, cd_size64, n_total64
    return cd_off, cd_size, n_total


def _zip64_resolve(extra: bytes, usize: int, csize: int,
                   off: int) -> tuple[int, int, int]:
    """Resolve ZIP64 sentinels field-wise: APPNOTE 4.5.3 — the 0x0001
    extra carries ONLY the fields whose 32-bit counterpart is
    0xFFFFFFFF, in usize/csize/offset order, so an archive may sentinel
    any subset (a >4 GB member at a <4 GB offset sentinels two; a small
    member past 4 GB sentinels only the offset)."""
    need = [usize == _FFFFFFFF, csize == _FFFFFFFF, off == _FFFFFFFF]
    if not any(need):
        return usize, csize, off
    pos = 0
    while pos + 4 <= len(extra):
        tag, ln = struct.unpack_from("<HH", extra, pos)
        pos += 4
        if tag == 0x0001:
            if ln < 8 * sum(need) or pos + ln > len(extra):
                raise ValueError("zip: truncated ZIP64 extra field")
            vals = iter(
                struct.unpack_from("<Q", extra, pos + 8 * i)[0]
                for i in range(sum(need))
            )
            out = [next(vals) if n else v
                   for n, v in zip(need, (usize, csize, off))]
            return out[0], out[1], out[2]
        pos += ln
    raise ValueError("zip: ZIP64 sentinel without the 0x0001 extra field")


def parse_zip_index(data: bytes | None) -> list[dict] | None:
    """.zip bytes → [{path, is_dir, size, attrib, mtime_tuple}] from the
    central directory alone — no payload reads, no decompression. None
    for non-ZIP input (no EOCD anywhere in the final 64 KB + no local
    header at byte 0); ValueError on a torn or miscounted directory.
    Directory detection: the DOS directory attribute bit OR a trailing
    '/' in the stored name (both conventions occur in the wild);
    backslashes normalize to '/' like the sibling parsers."""
    if not data or len(data) < 22:
        return None
    tail = data[-(65536 + 22):] if len(data) > 65536 + 22 else data
    span = eocd_span(tail, len(data))
    if span is None:
        return None if not data.startswith(_LOCAL_SIG) else _raise_torn()
    cd_off, cd_size, n_total = span
    if cd_off + cd_size > len(data):
        raise ValueError("zip: central directory overruns the archive")
    return _parse_central_directory(data[cd_off : cd_off + cd_size], n_total)


def parse_zip_index_file(fh) -> list[dict] | None:
    """Range-read variant of parse_zip_index over a seekable binary
    file: reads the final ~64 KB (EOCD scan) plus the central
    directory, never the payload — the two-range listing shape a
    100 TB entry stage wants."""
    fh.seek(0, 2)
    file_len = fh.tell()
    if file_len < 22:
        return None
    tail_len = min(file_len, 65536 + 22)
    fh.seek(file_len - tail_len)
    tail = fh.read(tail_len)
    span = eocd_span(tail, file_len)
    if span is None:
        fh.seek(0)
        return None if fh.read(4) != _LOCAL_SIG else _raise_torn()
    cd_off, cd_size, n_total = span
    if cd_off + cd_size > file_len:
        raise ValueError("zip: central directory overruns the archive")
    fh.seek(cd_off)
    cd = fh.read(cd_size)
    if len(cd) < cd_size:
        raise ValueError("zip: central directory truncated")
    return _parse_central_directory(cd, n_total)


def _parse_central_directory(cd: bytes, n_total: int,
                             collect: list | None = None) -> list[dict]:
    if n_total > 1 << 24:
        raise ValueError("zip: implausible entry count")
    out: list[dict] = []
    pos = 0
    for _ in range(n_total):
        if pos + 46 > len(cd):
            raise ValueError("zip: truncated central directory entry")
        if cd[pos : pos + 4] != _CEN_SIG:
            raise ValueError("zip: bad central directory signature")
        (_vmade, _vneed, flags, method, mtime, mdate, crc, csize,
         usize, nlen, elen, clen, _disk, _iattr, xattr,
         off) = struct.unpack_from("<HHHHHHIIIHHHHHII", cd, pos + 4)
        end = pos + 46 + nlen + elen + clen
        if end > len(cd):
            raise ValueError("zip: entry name/extra overruns the directory")
        raw_name = cd[pos + 46 : pos + 46 + nlen]
        extra = cd[pos + 46 + nlen : pos + 46 + nlen + elen]
        pos = end
        enc = "utf-8" if flags & 0x0800 else "cp437"
        try:
            name = raw_name.decode(enc)
        except UnicodeDecodeError as e:
            raise ValueError(f"zip: undecodable entry name: {e}") from e
        size, c_size, h_off = _zip64_resolve(extra, usize, csize, off)
        is_dir = bool(xattr & 0x10) or name.endswith("/")
        if collect is not None:
            collect.append({
                "method": method,
                "crc": crc,
                "csize": c_size,
                "local_off": h_off,
            })
        out.append({
            "path": name.replace("\\", "/").rstrip("/"),
            "is_dir": is_dir,
            "size": size,
            "attrib": xattr & 0xFF,
            "mtime_tuple": _dos_datetime(mdate, mtime),
        })
    # ZIP carries no directory CRC, so internal consistency is the
    # defense: the declared entry count must consume the declared
    # directory size exactly, or a corrupted count yields a silently
    # short (or long) listing
    if pos != len(cd):
        raise ValueError(
            f"zip: {n_total} entries consumed {pos} of {len(cd)} "
            "directory bytes"
        )
    return out


def _raise_torn():
    raise ValueError("zip: local header present but no central directory")


def extract_zip_members(data: bytes | None) -> list[dict] | None:
    """Full in-container extraction: parse_zip_index's listing plus a
    `content` bytes field (None for directories), read through each
    entry's local header and decoded with the stdlib coders real zips
    use — STORED and DEFLATE (raw zlib) — then CRC32- and size-verified
    against the central directory (`crc_ok`). This is the reference
    Extract stage's payload step for zip containers; other methods
    (implode, bzip2, AES) raise ValueError — the documented boundary.
    None for non-ZIP input; ValueError on torn local headers, short
    payloads, or a CRC mismatch (never a silently wrong payload)."""
    if not data or len(data) < 22:
        return None
    tail = data[-(65536 + 22):] if len(data) > 65536 + 22 else data
    span = eocd_span(tail, len(data))
    if span is None:
        return None if not data.startswith(_LOCAL_SIG) else _raise_torn()
    cd_off, cd_size, n_total = span
    if cd_off + cd_size > len(data):
        raise ValueError("zip: central directory overruns the archive")
    info: list[dict] = []
    entries = _parse_central_directory(
        data[cd_off : cd_off + cd_size], n_total, collect=info
    )
    for e, i in zip(entries, info):
        if e["is_dir"]:
            e["content"] = None
            e["crc_ok"] = None
            continue
        off = i["local_off"]
        if off + 30 > len(data) or data[off : off + 4] != _LOCAL_SIG:
            raise ValueError(f"zip: bad local header at {off}")
        nlen, elen = struct.unpack_from("<HH", data, off + 26)
        at = off + 30 + nlen + elen
        csize = i["csize"]
        if at + csize > len(data):
            raise ValueError(f"zip: payload at {at} overruns the archive")
        raw = data[at : at + csize]
        method = i["method"]
        if method == 0:
            content = raw
        elif method == 8:
            try:
                content = zlib.decompress(raw, -15)
            except zlib.error as exc:
                raise ValueError(f"zip: corrupt deflate stream: {exc}") from exc
        else:
            raise ValueError(
                f"zip: compression method {method} unsupported for extraction"
            )
        if len(content) != e["size"]:
            raise ValueError("zip: decoded size does not match the directory")
        if zlib.crc32(content) != i["crc"]:
            raise ValueError(f"zip: member {e['path']} CRC mismatch")
        e["crc_ok"] = True
        e["content"] = content
    return entries
