"""Deterministic media-format parsers: cue sheets and FLAC STREAMINFO.

Replaces the reference's cross-language cue path (python→.NET pythonnet →
CueSharp.cs 1340 LoC, cue_designator.py:17-66) with a plain-Python parser —
the cue format is line-oriented text — exposed UDTF-style: one cue document
in, one row per TRACK out, ready for `explode` (SURVEY.md §7.3).

Also the FLAC header fast-path (backfill_file_metadata.py:40-57): duration
from the first 42 bytes (STREAMINFO) without a full decode — hand-done
"column pruning" on a binary format.
"""

from __future__ import annotations

import re
import struct

from pyspark.sql import functions as F
from pyspark.sql import types as T

_FILE_RE = re.compile(r'^\s*FILE\s+"(?P<path>[^"]*)"\s+(?P<ftype>\S+)', re.I)
_TRACK_RE = re.compile(r"^\s*TRACK\s+(?P<num>\d+)\s+(?P<mode>\S+)", re.I)
_INDEX_RE = re.compile(
    r"^\s*INDEX\s+(?P<num>\d+)\s+(?P<mm>\d+):(?P<ss>\d+):(?P<ff>\d+)", re.I
)
_META_RE = re.compile(r'^\s*(?P<key>TITLE|PERFORMER)\s+"(?P<val>[^"]*)"', re.I)


def parse_cue(text: str | None) -> list[dict]:
    """Parse a cue sheet into track rows.

    Output rows: (file_path, track_number, track_mode, title, performer,
    index01_frames, start_seconds). INDEX 01 is the track start; cue frames
    run at 75/s. Sheet-level TITLE/PERFORMER (before any TRACK) are inherited
    by tracks that don't override them — CueSharp's semantics
    (CueSplit.cs:203-262) without the DLL.
    """
    if not text:
        return []
    tracks: list[dict] = []
    cur_file: str | None = None
    cur: dict | None = None
    sheet_meta = {"TITLE": None, "PERFORMER": None}
    for line in text.splitlines():
        m = _FILE_RE.match(line)
        if m:
            cur_file = m.group("path")
            continue
        m = _TRACK_RE.match(line)
        if m:
            cur = {
                "file_path": cur_file,
                "track_number": int(m.group("num")),
                "track_mode": m.group("mode").upper(),
                "title": sheet_meta["TITLE"],
                "performer": sheet_meta["PERFORMER"],
                "index01_frames": None,
                "start_seconds": None,
            }
            tracks.append(cur)
            continue
        m = _META_RE.match(line)
        if m:
            target = cur if cur is not None else sheet_meta
            target[m.group("key").upper() if cur is None else m.group("key").lower()] = m.group(
                "val"
            )
            continue
        m = _INDEX_RE.match(line)
        if m and cur is not None and int(m.group("num")) == 1:
            frames = (int(m.group("mm")) * 60 + int(m.group("ss"))) * 75 + int(m.group("ff"))
            cur["index01_frames"] = frames
            cur["start_seconds"] = round(frames / 75.0, 6)
    return tracks


CUE_TRACK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("file_path", T.StringType()),
            T.StructField("track_number", T.IntegerType()),
            T.StructField("track_mode", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("performer", T.StringType()),
            T.StructField("index01_frames", T.IntegerType()),
            T.StructField("start_seconds", T.DoubleType()),
        ]
    )
)


def cue_tracks_udf():
    """UDF: cue text column → array<struct> of track rows (explode after)."""
    return F.udf(parse_cue, CUE_TRACK_SCHEMA)


def streaminfo_duration(header: bytes | None) -> float | None:
    """Duration in seconds from a FLAC file's first 42 bytes.

    Layout: 'fLaC' magic (4) + metadata block header (4) + STREAMINFO (34);
    sample rate = 20 bits at offset 10 of STREAMINFO, total samples = 36 bits
    at offset 13.5 (backfill_file_metadata.py:40-57). Returns None on
    non-FLAC input — caller falls back to the full probe, exactly the
    reference's mutagen fallback.
    """
    if header is None or len(header) < 42 or header[:4] != b"fLaC":
        return None
    si = header[8:42]  # STREAMINFO payload
    (block,) = struct.unpack(">Q", si[10:18])
    sample_rate = block >> 44
    total_samples = block & ((1 << 36) - 1)
    if sample_rate == 0:
        return None
    return round(total_samples / sample_rate, 6)


def make_flac_header(sample_rate: int, total_samples: int) -> bytes:
    """Build a minimal valid 42-byte FLAC prefix (deterministic test double
    for real files — this container ships no audio fixtures)."""
    # stereo (channels-1=1 @bit41), 16-bit (bps-1=15 @bit36)
    block = (sample_rate << 44) | (1 << 41) | (15 << 36) | total_samples
    si = bytes(10) + struct.pack(">Q", block) + bytes(16)
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + si
