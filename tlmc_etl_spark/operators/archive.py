"""Archive index scan: list every archive's entries with no extraction
and explode them to rows — two interchangeable backends.

Reference: extract_plan.py:84-117 shells out `7z l -slt` per archive
and parses the output (split on the `----------` separator, then
`Path = ` / `Attributes = ` pairs, backslashes normalized, trailing
slashes stripped); an unreadable archive returns None and is planned
around, never crashed on.

`list_archives` keeps that subprocess shape (the process-UDF surface,
mirroring operators/process.py): one short-lived child per archive
inside a fanned-out `mapInPandas`, the parse in-task, and a failed
archive failing ITS rows only (one ok=false row carrying the exit
class). Tests drive it with tools/fake_7z so the spawn/parse/bad-exit
paths actually execute.

`list_archives_inproc` removes the tool dependency entirely: it parses
archive headers in-process across the reference's full container
surface — .7z end header (operators/sevenzip.py, stdlib lzma), .zip
central directory (operators/zipindex.py), .rar 4.x/5.0 block walk
(operators/rarindex.py) — the backend the registered
archive_index_scan / archive_size_audit queries use, and the shape a
100 TB entry stage wants: header RANGE READS per archive (head + end
header for 7z, tail + central directory for zip, header-hopping seeks
for rar) instead of a child process or a full-file read."""

from __future__ import annotations

import subprocess

import pandas as pd
from pyspark.sql import DataFrame

from tlmc_etl_spark.tuning import fanout

SEVEN_ZIP_CMD = ["7z", "l", "-slt"]

ENTRY_SCHEMA = (
    "archive string, entry string, is_dir boolean, ok boolean, reason string"
)
# the in-process parsers also surface per-entry sizes (the -slt text
# parse does not), so their operator carries one more column
ENTRY_SCHEMA_INPROC = (
    "archive string, entry string, is_dir boolean, size long, "
    "ok boolean, reason string"
)


def parse_slt(stdout: bytes) -> list[tuple[str, bool]] | None:
    """`7z l -slt` output → [(entry_path, is_dir)] — the reference's exact
    parse (extract_plan.py:99-116): one split on the separator, then
    Path/Attributes pairs; backslashes → slashes, trailing '/' stripped.
    Returns None when the separator is missing (truncated/garbage)."""
    body = stdout.decode("utf-8", errors="replace").split("\n----------\n", 1)
    if len(body) != 2:
        return None
    out: list[tuple[str, bool]] = []
    path: str | None = None
    for line in body[1].splitlines():
        if line.startswith("Path = "):
            path = line[len("Path = ") :].replace("\\", "/").rstrip("/")
        elif line.startswith("Attributes = ") and path is not None:
            out.append((path, "D" in line[len("Attributes = ") :]))
            path = None
    return out


def list_archives(
    archives: DataFrame,
    path_col: str = "path",
    list_cmd: list[str] | None = None,
    timeout_s: float = 30.0,
) -> DataFrame:
    """One row per archive entry: (archive, entry, is_dir, ok, reason).

    An unreadable archive (non-zero exit, timeout, unparseable output)
    yields a single ok=false row with entry null — the per-row isolation
    contract — so downstream planning sees every archive exactly once.
    """
    cmd = list(list_cmd) if list_cmd is not None else list(SEVEN_ZIP_CMD)
    slim = fanout(archives.select(path_col))

    def run(batches):
        for pdf in batches:
            out = []
            for p in pdf[path_col]:
                try:
                    r = subprocess.run(cmd + [p], capture_output=True, timeout=timeout_s)
                except subprocess.TimeoutExpired:
                    out.append((p, None, None, False, "timeout"))
                    continue
                except OSError as e:
                    out.append((p, None, None, False, f"spawn_error:{type(e).__name__}"))
                    continue
                if r.returncode != 0:
                    out.append((p, None, None, False, f"exit_{r.returncode}"))
                    continue
                entries = parse_slt(r.stdout)
                if entries is None:
                    out.append((p, None, None, False, "bad_listing"))
                    continue
                if not entries:
                    out.append((p, None, None, True, None))
                    continue
                for entry, is_dir in entries:
                    out.append((p, entry, is_dir, True, None))
            yield pd.DataFrame(
                out, columns=["archive", "entry", "is_dir", "ok", "reason"]
            )

    return slim.mapInPandas(run, schema=ENTRY_SCHEMA)


def parse_archive_index(data: bytes | None) -> list[dict] | None:
    """Magic-dispatched in-process archive index: .7z, .zip, and
    .rar (4.x/5.0) — the reference's full ARCHIVE_EXTENSIONS surface
    (extract_plan.py:37), listed with no child process and no
    extraction. None for unrecognized bytes; ValueError on torn
    headers (each parser's own contract)."""
    from tlmc_etl_spark.operators.rarindex import parse_rar_index
    from tlmc_etl_spark.operators.sevenzip import parse_7z_index
    from tlmc_etl_spark.operators.zipindex import parse_zip_index

    if data is None or len(data) < 4:
        return None
    if data[:2] == b"7z":
        return parse_7z_index(data)
    if data[:4] == b"Rar!":
        return parse_rar_index(data)
    if data[:2] == b"PK":
        return parse_zip_index(data)
    return None


def parse_archive_index_file(fh) -> list[dict] | None:
    """Range-read twin of parse_archive_index over a seekable binary
    file: the parsers seek to the header regions (7z head+end header,
    zip tail+central directory, rar header hops) and never read the
    payload — O(headers) bytes per archive, the listing I/O a 100 TB
    entry stage wants."""
    from tlmc_etl_spark.operators.rarindex import parse_rar_index_file
    from tlmc_etl_spark.operators.sevenzip import parse_7z_index_file
    from tlmc_etl_spark.operators.zipindex import parse_zip_index_file

    magic = fh.read(4)
    fh.seek(0)
    if len(magic) < 4:
        return None
    if magic[:2] == b"7z":
        return parse_7z_index_file(fh)
    if magic == b"Rar!":
        return parse_rar_index_file(fh)
    if magic[:2] == b"PK":
        return parse_zip_index_file(fh)
    return None


def list_archives_inproc(
    archives: DataFrame,
    path_col: str = "path",
) -> DataFrame:
    """In-container twin of `list_archives`: one row per entry from a
    direct header parse (7z end header, ZIP central directory, RAR
    block walk — operators/sevenzip.py, zipindex.py, rarindex.py) — no
    child process, no extraction. Same schema and per-row isolation
    contract: a non-archive file yields one ok=false row with reason
    'not_an_archive'; a torn or CRC-corrupt header yields 'bad_header';
    an unreadable path 'read_error:<class>'."""
    slim = fanout(archives.select(path_col))

    def run(batches):
        for pdf in batches:
            out = []
            for p in pdf[path_col]:
                try:
                    with open(p, "rb") as fh:
                        # range reads: header regions only, never the
                        # payload — O(headers) I/O per archive
                        idx = parse_archive_index_file(fh)
                except OSError as e:
                    out.append(
                        (p, None, None, None, False,
                         f"read_error:{type(e).__name__}")
                    )
                    continue
                except ValueError:
                    out.append((p, None, None, None, False, "bad_header"))
                    continue
                if idx is None:
                    out.append((p, None, None, None, False, "not_an_archive"))
                    continue
                if not idx:
                    out.append((p, None, None, None, True, None))
                    continue
                for e in idx:
                    out.append(
                        (p, e["path"], e["is_dir"], e["size"], True, None)
                    )
            yield pd.DataFrame(
                out,
                columns=["archive", "entry", "is_dir", "size", "ok",
                         "reason"],
            )

    return slim.mapInPandas(run, schema=ENTRY_SCHEMA_INPROC)
