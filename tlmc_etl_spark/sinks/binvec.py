"""Binary embedding sink: pooled vectors exported as `{uuid}.bin`
float32 files plus a provenance manifest.

Reference: export_pooled_from_store.py — mean pooling over a track's
chunks and concat(mean, max), accumulated fp32, NO renormalization,
written as raw little-endian float32 `<out>/<mode>/<uuid>.bin` with a
manifest.json recording dims/dtype/track count so the loader's config
comes from data rather than memory.

Spark shape: the pooled table is computed relationally upstream
(posexplode → groupBy mean/max — reducer state is one running sum per
(track, position)); the file write is a mapInPandas side-effect so each
task writes its own partition's files in parallel — the same pattern as
the CSV shard sink. The returned DataFrame is the manifest of written
files (path, n_floats), so the write is observable/testable as data."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tlmc_etl_spark.sources.binvec import uuid_of_int


def write_embedding_bins(pooled: DataFrame, out_dir: str, id_col: str, vec_col: str) -> DataFrame:
    """Write one `{uuid}.bin` per row (little-endian float32); returns the
    written-file manifest DataFrame (track_uuid, path, n_floats)."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batches):
        for pdf in batches:
            out = []
            for tid, vec in zip(pdf[id_col], pdf[vec_col]):
                u = uuid_of_int(int(tid))
                path = os.path.join(out_dir, f"{u}.bin")
                arr = np.asarray(vec, dtype="<f4")
                arr.tofile(path)
                out.append((u, path, len(arr)))
            yield pd.DataFrame(out, columns=["track_uuid", "path", "n_floats"])

    return pooled.select(id_col, vec_col).mapInPandas(
        write, schema="track_uuid string, path string, n_floats int"
    )


def write_manifest(out_dir: str, dims: int, n_tracks: int, pooling: str = "mean") -> str:
    """The provenance manifest the loader fills its config from."""
    path = os.path.join(out_dir, "manifest.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(
            {"poolings": {pooling: dims}, "dtype": "float32", "tracks": n_tracks},
            f,
            indent=4,
        )
    return path
