"""Binary embedding source: `{uuid}.bin` float32 vector files.

The reference stores per-track pooled vectors as raw little-endian
float32 files named by track uuid and loads them with per-file
validation — a non-uuid filename is skipped with a warning, a truncated
file fails its own row (never the batch) via an exact dimension check
(Finalizer/PushToDb/Operations/TrackEmbeddingProcessor.cs:118-168).

Spark shape: `binaryFile` scan (path + content columns, distributed,
predicate-pushes the glob) → one Arrow-batched decode that casts bytes
to float32, so the hot path is a numpy frombuffer per file, not
per-element Python. Invalid rows come back flagged, not dropped — the
caller decides whether to audit or filter them (the reference counts
and reports both kinds)."""

from __future__ import annotations

import uuid as _uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def uuid_of_int(i: int) -> str:
    """Deterministic uuid for an integer id (the synthetic stand-in for
    the catalogue's real track uuids)."""
    return str(_uuid.UUID(int=i))


def read_embedding_bins(spark: SparkSession, dir_path: str, expected_dims: int) -> DataFrame:
    """Scan `{uuid}.bin` files → (track_uuid, track_int, embedding,
    n_floats, valid, reason).

    valid=false rows carry reason 'bad_filename' (stem not a uuid) or
    'wrong_dims' (float count != expected) — the reference's two skip
    classes, surfaced as data instead of console warnings."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(dir_path)
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                stem = path.rsplit("/", 1)[-1][: -len(".bin")]
                try:
                    u = _uuid.UUID(stem)
                except ValueError:
                    out.append((stem, None, None, 0, False, "bad_filename"))
                    continue
                # uuid ints are 128-bit; only surface the int form when it
                # fits a signed long (the synthetic-uuid case) — a genuine
                # random uuid would overflow the Arrow long conversion and
                # take the whole batch down with it, breaking the
                # "fails its own row, never the batch" contract.
                u_int = u.int if u.int < (1 << 63) else None
                vec = np.frombuffer(content, dtype="<f4")
                if len(vec) != expected_dims:
                    out.append((stem, u_int, None, len(vec), False, "wrong_dims"))
                    continue
                out.append((stem, u_int, vec.tolist(), len(vec), True, None))
            yield pd.DataFrame(
                out,
                columns=["track_uuid", "track_int", "embedding", "n_floats", "valid", "reason"],
            )

    return raw.mapInPandas(
        decode,
        schema=(
            "track_uuid string, track_int long, embedding array<float>, "
            "n_floats int, valid boolean, reason string"
        ),
    )
