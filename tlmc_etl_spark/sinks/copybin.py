"""COPY-grade bulk-load sink: PostgreSQL COPY BINARY file shards.

The reference's fastest DB load path is a binary COPY inside one
transaction (truncate + NpgsqlBinaryImporter,
Finalizer/PushToDb/Operations/SimilarTrackProcessor.cs:39-92). There is
no database in this environment, so the engine produces the artifact
that path consumes: COPY BINARY files, one per hash shard, in the
documented wire format (PG docs "Binary Format"):

  header   = 11-byte signature "PGCOPY\\n\\xff\\r\\n\\0"
             + int32 flags (0) + int32 header-extension length (0)
  per row  = int16 field count, then per field int32 byte length
             (-1 for NULL) + big-endian payload
  trailer  = int16 -1

Supported field encodings: int64 (8B), int32 (4B), float64 (8B),
float32 (4B), utf-8 text. Shard writing is an applyInPandas group task
(one file per shard, written in parallel, bounded by shard size), and
the returned DataFrame is the per-shard framing arithmetic (row count,
payload bytes, total file bytes) — which is pure algebra over the input
table, so a SQL oracle can value-check the writer end to end without
reading a byte back. Byte-exactness is unit-tested by decoding the
files (tests/test_sources_sinks.py)."""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIGNATURE = b"PGCOPY\n\xff\r\n\x00"
HEADER_LEN = len(SIGNATURE) + 8  # + int32 flags + int32 extension length = 19
TRAILER_LEN = 2

_PACKERS = {
    "bigint": lambda v: struct.pack(">q", int(v)),
    "int": lambda v: struct.pack(">i", int(v)),
    "double": lambda v: struct.pack(">d", float(v)),
    "float": lambda v: struct.pack(">f", float(v)),
    "string": lambda v: str(v).encode("utf-8"),
}


def encode_copy_binary(rows: list[tuple], types: list[str]) -> bytes:
    """Encode rows (already ordered) as one COPY BINARY payload."""
    out = [SIGNATURE, struct.pack(">i", 0), struct.pack(">i", 0)]
    packers = [_PACKERS[t] for t in types]
    n = len(types)
    for row in rows:
        out.append(struct.pack(">h", n))
        for v, pack in zip(row, packers):
            if v is None:
                out.append(struct.pack(">i", -1))
            else:
                b = pack(v)
                out.append(struct.pack(">i", len(b)))
                out.append(b)
    out.append(struct.pack(">h", -1))
    return b"".join(out)


def decode_copy_binary(data: bytes, types: list[str]) -> list[tuple]:
    """Inverse of encode_copy_binary — the test-side reader."""
    assert data[: len(SIGNATURE)] == SIGNATURE, "bad COPY signature"
    pos = HEADER_LEN
    unpack = {
        "bigint": lambda b: struct.unpack(">q", b)[0],
        "int": lambda b: struct.unpack(">i", b)[0],
        "double": lambda b: struct.unpack(">d", b)[0],
        "float": lambda b: struct.unpack(">f", b)[0],
        "string": lambda b: b.decode("utf-8"),
    }
    rows = []
    while True:
        (n,) = struct.unpack(">h", data[pos : pos + 2])
        pos += 2
        if n == -1:
            break
        row = []
        for t in types:
            (ln,) = struct.unpack(">i", data[pos : pos + 4])
            pos += 4
            if ln == -1:
                row.append(None)
            else:
                row.append(unpack[t](data[pos : pos + ln]))
                pos += ln
        rows.append(tuple(row))
    return rows


def write_copy_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int = 8,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Hash-shard `df` and write one COPY BINARY file per shard.

    Shard = multiplicative hash of the key (the journal/shard convention
    shared with hash_shard_assign, so the oracle can reproduce it in
    SQL); rows within a shard write in (order_cols or key) order so the
    file bytes are layout-independent. Returns (shard, n_rows,
    payload_bytes, file_bytes)."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [c for c in df.columns]
    types = [f.dataType.simpleString() for f in df.schema.fields]
    for t in types:
        if t not in _PACKERS:
            raise ValueError(f"unsupported COPY type: {t}")
    order = order_cols or [key_col]
    shard = ((F.col(key_col) * F.lit(2654435761)) % F.lit(4294967296) % n_shards).alias(
        "__shard"
    )
    with_shard = df.select(*cols, shard)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values(order, kind="mergesort")
        rows = [tuple(r) for r in pdf[cols].itertuples(index=False, name=None)]
        blob = encode_copy_binary(rows, types)
        with open(os.path.join(out_dir, f"shard_{s:03d}.copy"), "wb") as f:
            f.write(blob)
        payload = len(blob) - HEADER_LEN - TRAILER_LEN
        return pd.DataFrame(
            {"shard": [s], "n_rows": [len(rows)], "payload_bytes": [payload], "file_bytes": [len(blob)]}
        )

    return with_shard.groupBy("__shard").applyInPandas(
        write_group, schema="shard int, n_rows long, payload_bytes long, file_bytes long"
    )
