"""Generate structural Ogg goldens (round-14 VERDICT #6) with an
INDEPENDENT second implementation of the RFC 3533 page grammar.

The gap being closed: `ogg_tag_scan` and the Ogg chunk plans were
verified only against pages built by the repo's own `make_ogg_page`, so
a shared misreading of the spec (builder and parser written by the same
hand) could pass. True externally-generated files are impossible in this
container (no Ogg encoder); the honest substitute is what this module
is: a from-scratch, struct-free page writer with a BIT-LEVEL polynomial
CRC (init 0, generator 0x04c11db7, no reflection, no final XOR — the
direct RFC 3533 §6 definition, deliberately NOT the zlib-based trick
functions/media.ogg_crc uses). tests/test_ogg_goldens.py then pins:

 - the two CRC implementations agree on arbitrary inputs;
 - the two page writers emit byte-identical pages for the same inputs;
 - the committed fixtures regenerate bit-for-bit, their page CRCs match
   pinned literal constants, and the in-repo parser walks them with the
   exact header/granule fields (OpusHead pre-skip, RFC 7845 §4.2
   granule math, Vorbis §4.2.2 identity, comment tags);
 - flipping any fixture byte makes the parser raise (CRC actually
   verifies).

Audio packet payloads are deterministic filler — these are STRUCTURAL
goldens (framing, headers, granules); PCM decode stays at the
ffmpeg/golden-PCM boundary.

Usage: python tools/gen_ogg_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

OGG_DIR = os.path.join("fixtures", "ogg")


# --- independent RFC 3533 implementation (no repo imports, no zlib) ----


def crc_rfc3533(data: bytes) -> int:
    """Direct bitwise polynomial division: register init 0, MSB-first,
    generator 0x04c11db7, no reflection, no final XOR."""
    reg = 0
    for byte in data:
        reg ^= byte << 24
        for _ in range(8):
            if reg & 0x80000000:
                reg = ((reg << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
            else:
                reg = (reg << 1) & 0xFFFFFFFF
    return reg


def _le(n: int, width: int) -> bytes:
    return n.to_bytes(width, "little", signed=n < 0)


def page_rfc3533(
    serial: int,
    page_seq: int,
    granule: int,
    packets: list[bytes],
    header_type: int,
) -> bytes:
    """One page, assembled field-by-field from the §6 layout."""
    lacing = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q
        lacing.append(r)
    assert len(lacing) <= 255
    head = (
        b"OggS"
        + b"\x00"                       # stream_structure_version
        + bytes([header_type])          # continued/bos/eos flags
        + _le(granule, 8)               # granule_position
        + _le(serial, 4)
        + _le(page_seq, 4)
        + b"\x00\x00\x00\x00"           # crc placeholder
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    body = b"".join(packets)
    crc = crc_rfc3533(head + body)
    return head[:22] + _le(crc, 4) + head[26:] + body


def opus_head(channels: int, pre_skip: int, input_rate: int) -> bytes:
    """RFC 7845 §5.1, field-by-field."""
    return (
        b"OpusHead" + bytes([1, channels]) + _le(pre_skip, 2)
        + _le(input_rate, 4) + b"\x00\x00" + b"\x00"
    )


def vorbis_id(channels: int, rate: int) -> bytes:
    """Vorbis I §4.2.2 (blocksizes 256/2048), field-by-field."""
    return (
        b"\x01vorbis" + _le(0, 4) + bytes([channels]) + _le(rate, 4)
        + _le(0xFFFFFFFF, 4) + _le(0, 4) + _le(0xFFFFFFFF, 4)
        + bytes([(11 << 4) | 8, 0x01])
    )


def comment_block(vendor: bytes, items: list[bytes]) -> bytes:
    out = _le(len(vendor), 4) + vendor + _le(len(items), 4)
    for it in items:
        out += _le(len(it), 4) + it
    return out


def golden_opus() -> bytes:
    """Mono Opus stream, pre_skip 312: OpusHead page (bos) + OpusTags
    page + two audio pages (two 960-sample packets, then one, eos).
    Granules include pre_skip per RFC 7845 §4.2."""
    serial = 0xABCD
    pages = [
        page_rfc3533(serial, 0, 0, [opus_head(1, 312, 48000)], 0x02),
        page_rfc3533(
            serial, 1, 0,
            [b"OpusTags" + comment_block(b"golden", [b"TITLE=golden-opus"])],
            0x00,
        ),
        page_rfc3533(
            serial, 2, 312 + 2 * 960,
            [bytes((i * 11 + 3) % 256 for i in range(40)),
             bytes((i * 13 + 5) % 256 for i in range(37))],
            0x00,
        ),
        page_rfc3533(
            serial, 3, 312 + 3 * 960,
            [bytes((i * 17 + 7) % 256 for i in range(31))],
            0x04,
        ),
    ]
    return b"".join(pages)


def golden_vorbis() -> bytes:
    """Stereo 44.1 kHz Vorbis stream: ID page (bos) + comment+setup page
    + two audio pages (granules 512, 1536, eos)."""
    serial = 0x5151
    setup = b"\x05vorbis" + bytes((7 * i + 1) % 256 for i in range(48)) + b"\x01"
    pages = [
        page_rfc3533(serial, 0, 0, [vorbis_id(2, 44100)], 0x02),
        page_rfc3533(
            serial, 1, 0,
            [b"\x03vorbis"
             + comment_block(b"golden", [b"TITLE=golden-vorbis", b"ARTIST=a1"])
             + b"\x01",
             setup],
            0x00,
        ),
        page_rfc3533(
            serial, 2, 512,
            [bytes((i * 19 + 2) % 256 for i in range(52))], 0x00,
        ),
        page_rfc3533(
            serial, 3, 1536,
            [bytes((i * 23 + 9) % 256 for i in range(44))], 0x04,
        ),
    ]
    return b"".join(pages)


def main() -> int:
    os.makedirs(OGG_DIR, exist_ok=True)
    for name, data in (("golden_opus.ogg", golden_opus()),
                       ("golden_vorbis.ogg", golden_vorbis())):
        with open(os.path.join(OGG_DIR, name), "wb") as f:
            f.write(data)
        print(f"wrote {name}: {len(data)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
