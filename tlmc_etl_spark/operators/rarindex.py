"""In-container RAR archive-index parse: header walk for RAR 4.x and
RAR 5.0, no payload extraction, stdlib only.

The reference lists `.rar` archives through the same `7z l -slt` child
process as `.7z` (extract_plan.py:37 ARCHIVE_EXTENSIONS includes
".rar"; the corpus's v4-era releases shipped as .rar —
unextracted_snapshot.py:6). RAR *compression* is proprietary, but the
CONTAINER layout is published by rarlab (technote: "RAR 5.0 archive
format" and the 1.5–4.x block layout), and a listing needs only the
headers: every block declares its packed-data size, so the walk skips
payload bytes entirely — names, unpacked sizes, directory flags and
times come out without any decompression, which is exactly what the
entry stage consumes.

Same contracts as the sibling index modules (sevenzip.py, zipindex.py):
spec-built writers (`encode_rar4`/`encode_rar5`, stored method) for
test payloads, header CRCs verified, ValueError — never struct.error or
a silently short listing — on torn headers.
"""

from __future__ import annotations

import struct
import zlib

_SIG_RAR4 = b"Rar!\x1a\x07\x00"
_SIG_RAR5 = b"Rar!\x1a\x07\x01\x00"

# RAR5 header types
_R5_MAIN = 1
_R5_FILE = 2
_R5_SERVICE = 3
_R5_END = 5

# RAR4 block types
_R4_MAIN = 0x73
_R4_FILE = 0x74
_R4_END = 0x7B


# ---------------------------------------------------------------------------
# RAR5 vint: 7 value bits per byte, low groups first, bit 7 = continue.
# ---------------------------------------------------------------------------


def _write_vint(n: int) -> bytes:
    if n < 0:
        raise ValueError("rar: negative vint")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_vint(data: bytes, pos: int) -> tuple[int, int]:
    value = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("rar: truncated vint")
        b = data[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7
        if shift > 63:
            raise ValueError("rar: vint overflows 64 bits")


# ---------------------------------------------------------------------------
# Writers (test doubles, stored method only).
# ---------------------------------------------------------------------------


def _rar5_block(htype: int, body: bytes, data: bytes = b"",
                extra: bytes = b"") -> bytes:
    flags = (0x0002 if data else 0x0000) | (0x0001 if extra else 0x0000)
    fields = _write_vint(htype) + _write_vint(flags)
    if extra:
        fields += _write_vint(len(extra))
    if data:
        fields += _write_vint(len(data))
    fields += body + extra  # extra area sits at the END of the header
    hdr = _write_vint(len(fields)) + fields
    return struct.pack("<I", zlib.crc32(hdr)) + hdr + data


def encode_rar5(entries: list[tuple[str, bool, bytes | None]],
                mtime_unix: int | None = None,
                with_crcs: bool = False,
                method: int | dict[str, int] = 0,
                encrypted: bool | set[str] = False) -> bytes:
    """Entries [(path, is_dir, payload)] → RAR 5.0 bytes with stored
    (method 0) payloads — enough container to exercise the full header
    walk: vints, header CRCs, data-area skips, directory and mtime
    flags. with_crcs plants the per-file data CRC32 (file flag 0x0004)
    extraction verifies against.

    `method` > 0 stamps that compression method into compression_info
    (the payload bytes are then opaque filler — refusal-test double for
    the proprietary-codec boundary); `encrypted=True` appends a minimal
    file-encryption extra record (type 0x01, AES-256 v0 shape) so the
    encryption refusal family is constructible too. Both knobs accept a
    per-path form (dict path→method / set of paths) so MIXED archives —
    a refused member's data area preceding a stored one — exercise the
    extraction offset accounting across skipped payloads."""
    out = bytearray(_SIG_RAR5)
    out += _rar5_block(_R5_MAIN, _write_vint(0))  # archive flags = 0
    for path, is_dir, payload in entries:
        data = b"" if is_dir or payload is None else bytes(payload)
        fflags = 0x0001 if is_dir else 0x0000
        if mtime_unix is not None:
            fflags |= 0x0002
        if with_crcs and not is_dir:
            fflags |= 0x0004
        body = _write_vint(fflags)
        body += _write_vint(0 if is_dir else len(data))  # unpacked size
        body += _write_vint(0x10 if is_dir else 0x20)  # attributes
        if mtime_unix is not None:
            body += struct.pack("<I", mtime_unix)
        if with_crcs and not is_dir:
            body += struct.pack("<I", zlib.crc32(data))
        m = method.get(path, 0) if isinstance(method, dict) else method
        body += _write_vint((m & 0x07) << 7)  # compression info
        body += _write_vint(0)  # host OS
        raw = path.encode("utf-8")
        body += _write_vint(len(raw)) + raw
        enc = (path in encrypted) if isinstance(encrypted, set) else encrypted
        extra = b""
        if enc and not is_dir:
            # extra record: size vint covers type + record data
            rec = _write_vint(0x01) + _write_vint(0) + bytes(1)  # type, ver, flags
            extra = _write_vint(len(rec)) + rec
        out += _rar5_block(_R5_FILE, body, data, extra=extra)
    out += _rar5_block(_R5_END, _write_vint(0))
    return bytes(out)


def _rar4_block(htype: int, flags: int, body: bytes,
                data: bytes = b"") -> bytes:
    if data:
        flags |= 0x8000
        body = struct.pack("<I", len(data)) + body
    size = 7 + len(body)
    hdr = bytes([htype]) + struct.pack("<HH", flags, size) + body
    crc = zlib.crc32(hdr) & 0xFFFF
    return struct.pack("<H", crc) + hdr + data


def encode_rar4(entries: list[tuple[str, bool, bytes | None]],
                dos_time: int = 0x5B0F6C3D,
                method: int = 0x30,
                encrypted: bool = False) -> bytes:
    """Entries → RAR 1.5–4.x bytes with stored (0x30) payloads. Names
    must be ASCII (the 4.x single-byte name page; the corpus's wide
    names arrived with the 5.0-era releases)."""
    out = bytearray(_SIG_RAR4)
    out += _rar4_block(_R4_MAIN, 0x0000, bytes(6))  # HighPosAv + PosAv
    for path, is_dir, payload in entries:
        raw = path.encode("ascii")
        data = b"" if is_dir or payload is None else bytes(payload)
        flags = 0x8000  # ADD_SIZE always present in our file blocks
        if encrypted and not is_dir:
            flags |= 0x0004  # LHD_PASSWORD
        if is_dir:
            flags |= 0x00E0  # directory: all three "window" bits set
        body = struct.pack(
            "<IIBIIBBHI",
            len(data),  # PACK_SIZE (duplicated by the 0x8000 ADD_SIZE)
            0 if is_dir else len(data),  # UNP_SIZE
            2,  # HOST_OS: Windows
            zlib.crc32(data),  # FILE_CRC
            dos_time,  # FTIME (DOS packed)
            20,  # UNP_VER
            method,  # METHOD: 0x30 = store
            len(raw),  # NAME_SIZE
            0x10 if is_dir else 0x20,  # ATTR
        ) + raw
        size = 7 + len(body)
        hdr = bytes([_R4_FILE]) + struct.pack("<HH", flags, size) + body
        crc = zlib.crc32(hdr) & 0xFFFF
        out += struct.pack("<H", crc) + hdr + data
    out += _rar4_block(_R4_END, 0x4000, b"")
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def parse_rar_index(data: bytes | None) -> list[dict] | None:
    """.rar bytes (4.x or 5.0) → [{path, is_dir, size, attrib,
    mtime_unix | mtime_dos}] from the header walk alone. None for
    non-RAR input; ValueError on torn or CRC-corrupt headers."""
    if not data or len(data) < 7:
        return None
    import io

    if data.startswith(_SIG_RAR5):
        return _walk_rar5(io.BytesIO(data), len(_SIG_RAR5))
    if data.startswith(_SIG_RAR4):
        return _walk_rar4(io.BytesIO(data), len(_SIG_RAR4))
    return None


def parse_rar_index_file(fh) -> list[dict] | None:
    """Range-read variant over a seekable binary file: RAR headers are
    interleaved with payload, but every block declares its data size,
    so the walk reads headers and SEEKS past payloads — O(headers)
    bytes per archive regardless of payload size."""
    sig = fh.read(8)
    if sig.startswith(_SIG_RAR5):
        return _walk_rar5(fh, 8)
    if sig[:7] == _SIG_RAR4:
        return _walk_rar4(fh, 7)
    return None


def _rar5_extra_has_encryption(extra: bytes) -> bool:
    """Walk a RAR5 extra area's (size, type, data) records; True when a
    file-encryption record (type 0x01) is present — the header-level
    signal that the data area is AES ciphertext."""
    p = 0
    while p < len(extra):
        rec_size, p = _read_vint(extra, p)
        if rec_size == 0 or p + rec_size > len(extra):
            raise ValueError("rar5: torn extra-area record")
        rtype, q = _read_vint(extra, p)
        if rtype == 0x01:
            return True
        p += rec_size
    return False


def _walk_rar5(fh, start: int, collect: list | None = None) -> list[dict]:
    fh.seek(0, 2)
    file_end = fh.tell()
    fh.seek(start)
    out: list[dict] = []
    while True:
        lead = fh.read(4)
        if len(lead) == 0:
            # RAR5 mandates an end-of-archive block: running out of
            # bytes first means truncation, never a silently short
            # listing
            raise ValueError(
                "rar5: stream ended before the end-of-archive block"
            )
        if len(lead) < 4:
            raise ValueError("rar5: truncated block header")
        want_crc = struct.unpack("<I", lead)[0]
        size_bytes = bytearray()
        while True:
            b = fh.read(1)
            if not b:
                raise ValueError("rar5: truncated header size")
            size_bytes += b
            if not b[0] & 0x80:
                break
            if len(size_bytes) > 9:
                raise ValueError("rar5: header size vint overflows")
        size, _ = _read_vint(bytes(size_bytes), 0)
        if size == 0:
            raise ValueError("rar5: zero-size header")
        # validate BEFORE reading: the size vint precedes CRC coverage,
        # so corruption reaches it — an unbounded fh.read(size) would
        # escape as MemoryError/OverflowError instead of ValueError
        if size > file_end - fh.tell():
            raise ValueError("rar5: header overruns the archive")
        hdr = fh.read(size)
        if len(hdr) < size:
            raise ValueError("rar5: header overruns the archive")
        # CRC covers the size vint + header contents (technote: "from
        # Header size field to the end of header")
        if zlib.crc32(bytes(size_bytes) + hdr) != want_crc:
            raise ValueError("rar5: header CRC mismatch")
        p = 0
        htype, p = _read_vint(hdr, p)
        hflags, p = _read_vint(hdr, p)
        data_size = 0
        extra_size = 0
        if hflags & 0x0001:
            extra_size, p = _read_vint(hdr, p)  # extra area: inside `size`
            if extra_size > len(hdr):
                raise ValueError("rar5: extra area overruns the header")
        if hflags & 0x0002:
            data_size, p = _read_vint(hdr, p)
        if htype in (_R5_FILE, _R5_SERVICE):
            fflags, p = _read_vint(hdr, p)
            unp_size, p = _read_vint(hdr, p)
            attrib, p = _read_vint(hdr, p)
            mtime = None
            if fflags & 0x0002:
                if p + 4 > len(hdr):
                    raise ValueError("rar5: truncated mtime field")
                mtime = struct.unpack_from("<I", hdr, p)[0]
                p += 4
            data_crc = None
            if fflags & 0x0004:
                if p + 4 > len(hdr):
                    raise ValueError("rar5: truncated data CRC field")
                data_crc = struct.unpack_from("<I", hdr, p)[0]
                p += 4
            comp, p = _read_vint(hdr, p)
            _host, p = _read_vint(hdr, p)
            nlen, p = _read_vint(hdr, p)
            if p + nlen > len(hdr):
                raise ValueError("rar5: name overruns the header")
            try:
                name = hdr[p : p + nlen].decode("utf-8")
            except UnicodeDecodeError as e:
                raise ValueError(f"rar5: undecodable name: {e}") from e
            if htype == _R5_FILE:
                is_dir = bool(fflags & 0x0001)
                # flag 0x0008: unpacked size is UNKNOWN (stream input);
                # the size field is a placeholder that must not be
                # reported as a real byte count
                size_known = not fflags & 0x0008
                entry = {
                    "path": name.replace("\\", "/").rstrip("/"),
                    "is_dir": is_dir,
                    "size": (0 if is_dir else unp_size)
                    if size_known else None,
                    "attrib": attrib,
                    "mtime_unix": mtime,
                }
                if collect is not None:
                    # the extra area occupies the header TAIL; it must
                    # not overlap the fields just parsed (the name ends
                    # at p + nlen) — a crafted header could otherwise alias
                    # htype/name bytes as extra records and spuriously
                    # mark a stored member encrypted (or tear the walk)
                    if extra_size > len(hdr) - (p + nlen):
                        raise ValueError(
                            "rar5: extra area overlaps header fields"
                        )
                    collect.append({
                        "data_off": fh.tell(),
                        "data_size": data_size,
                        "method": (comp >> 7) & 0x07,
                        "data_crc": data_crc,
                        "encrypted": _rar5_extra_has_encryption(
                            hdr[len(hdr) - extra_size:] if extra_size else b""
                        ),
                    })
                out.append(entry)
        if htype == _R5_END:
            return out
        if data_size:
            # pre-check: a declared size >= 2^63 would overflow the
            # seek itself (C ssize_t) before the post-check could run
            if data_size > file_end - fh.tell():
                raise ValueError("rar5: data area overruns the archive")
            fh.seek(data_size, 1)


def _walk_rar4(fh, start: int, collect: list | None = None) -> list[dict]:
    fh.seek(0, 2)
    file_end = fh.tell()
    fh.seek(start)
    out: list[dict] = []
    first = True
    while True:
        head = fh.read(7)
        if len(head) == 0 and not first:
            # the 4.x ENDARC block is optional: clean EOF at a block
            # boundary is a complete archive
            return out
        if len(head) < 7:
            raise ValueError(
                "rar4: no blocks after the signature" if first
                else "rar4: trailing bytes are not a complete block"
            )
        first = False
        want_crc = struct.unpack_from("<H", head, 0)[0]
        htype = head[2]
        hflags, hsize = struct.unpack_from("<HH", head, 3)
        if hsize < 7:
            raise ValueError("rar4: header size below the block minimum")
        body = fh.read(hsize - 7)
        if len(body) < hsize - 7:
            raise ValueError("rar4: header overruns the archive")
        if zlib.crc32(head[2:] + body) & 0xFFFF != want_crc:
            raise ValueError("rar4: header CRC mismatch")
        add_size = 0
        if htype == _R4_FILE:
            if len(body) < 25:
                raise ValueError("rar4: file header too short")
            (pack_size, unp_size, _host, _crc, ftime, _ver, _method,
             nlen, attr) = struct.unpack_from("<IIBIIBBHI", body, 0)
            add_size = pack_size
            name_off = 25
            if hflags & 0x0100:  # HIGH_PACK_SIZE / HIGH_UNP_SIZE
                if len(body) < 33:
                    raise ValueError("rar4: truncated 64-bit size fields")
                high_pack, high_unp = struct.unpack_from("<II", body, 25)
                add_size |= high_pack << 32
                unp_size |= high_unp << 32
                name_off = 33
            if name_off + nlen > len(body):
                raise ValueError("rar4: name overruns the header")
            raw = body[name_off : name_off + nlen]
            if hflags & 0x0200:  # unicode variant: plain part before NUL
                raw = raw.split(b"\x00", 1)[0]
            name = raw.decode("utf-8", errors="replace")
            is_dir = (hflags & 0x00E0) == 0x00E0
            if collect is not None:
                collect.append({
                    "data_off": fh.tell(),
                    "data_size": add_size,
                    "method": _method,
                    "data_crc": _crc,
                    "encrypted": bool(hflags & 0x0004),  # LHD_PASSWORD
                })
            out.append({
                "path": name.replace("\\", "/").rstrip("/"),
                "is_dir": is_dir,
                "size": 0 if is_dir else unp_size,
                "attrib": attr,
                "mtime_dos": ftime,
            })
        elif hflags & 0x8000:  # any other block carrying data
            if len(body) < 4:
                raise ValueError("rar4: missing ADD_SIZE field")
            add_size = struct.unpack_from("<I", body, 0)[0]
        if htype == _R4_END:
            return out
        if add_size:
            if add_size > file_end - fh.tell():
                raise ValueError("rar4: data area overruns the archive")
            fh.seek(add_size, 1)


def extract_rar_members(data: bytes | None) -> list[dict] | None:
    """Payload extraction for the spec-extractable subset of RAR:
    STORED members (RAR5 method 0 / 4.x method 0x30) slice straight
    from the data area, size- and CRC32-verified when the header
    carries a digest. COMPRESSED members return content=None with
    reason='rar compression unsupported' instead of raising — the RAR
    codec is proprietary and undocumented, so the child-process lane
    (`unrar`/`7z`) is the only honest decode path for them; refusing
    the whole archive would make the function useless on the default
    layout. None for non-RAR input; ValueError on torn headers, short
    data areas, or a CRC mismatch on a stored member."""
    import io

    if not data or len(data) < 8:
        return None
    if data.startswith(_SIG_RAR5):
        fh, walker, start = io.BytesIO(data), _walk_rar5, len(_SIG_RAR5)
        stored_method = 0
    elif data.startswith(_SIG_RAR4):
        fh, walker, start = io.BytesIO(data), _walk_rar4, len(_SIG_RAR4)
        stored_method = 0x30
    else:
        return None
    info: list[dict] = []
    entries = walker(fh, start, collect=info)
    if len(info) != len(entries):
        raise ValueError("rar: extraction info does not cover the listing")
    for e, i in zip(entries, info):
        if e["is_dir"]:
            e["content"] = None
            e["crc_ok"] = None
            e["reason"] = None
            continue
        if i.get("encrypted"):
            # AES-256 payloads need the password + the RAR KDF — a
            # secret-handling concern, out of engine scope by design
            e["content"] = None
            e["crc_ok"] = None
            e["reason"] = "rar encryption unsupported"
            continue
        if i["method"] != stored_method:
            e["content"] = None
            e["crc_ok"] = None
            e["reason"] = "rar compression unsupported"
            continue
        at, n = i["data_off"], i["data_size"]
        if at + n > len(data):
            raise ValueError("rar: stored data overruns the archive")
        content = data[at : at + n]
        if e["size"] is not None and len(content) != e["size"]:
            raise ValueError("rar: stored size does not match the header")
        crc = i["data_crc"]
        if crc is not None and zlib.crc32(content) != crc:
            raise ValueError(f"rar: member {e['path']} CRC mismatch")
        e["content"] = content
        e["crc_ok"] = None if crc is None else True
        e["reason"] = None
    return entries
