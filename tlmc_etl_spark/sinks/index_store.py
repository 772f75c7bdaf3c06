"""IVF+PQ serving-index persistence: the index as three parquet tables.

The reference builds its ANN index offline and ships it to the serving
tier as a binary artifact (faiss_index_builder.py:10-23). The
Spark-native equivalent keeps the index IN the lakehouse: coarse
centroids, PQ codebooks, and the encoded corpus are each a parquet
table, so the serving join (plans/serving.py) reads them like any other
dimension — versionable, partition-prunable, and rebuildable
incrementally (re-encode only new vectors; retrain only on drift).

Layout under `path/`:
  coarse/     (cell int, centroid array<double>)         — n_centroids rows
  codebooks/  (subspace int, code int, centroid array<double>) — m*k rows
  codes/      (<id>, cell, codes array<int>)             — one row per vector

float64 round-trips bit-exactly through parquet doubles, so a reloaded
index scores IDENTICALLY to the in-memory one (gated in
tests/test_index_store.py, not just approximately).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def save_ivfpq_index(
    spark: SparkSession,
    path: str,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    codes_df: DataFrame,
) -> None:
    """Persist (coarse (C,d), codebooks (m,k,ds), encoded corpus)."""
    coarse_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(coarse)]
    spark.createDataFrame(coarse_rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "coarse"))
    m, k, _ = codebooks.shape
    cb_rows = [
        (int(s), int(c), [float(x) for x in codebooks[s, c]])
        for s in range(m)
        for c in range(k)
    ]
    spark.createDataFrame(
        cb_rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    codes_df.write.mode("overwrite").parquet(os.path.join(path, "codes"))


def load_ivfpq_index(
    spark: SparkSession, path: str
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """Reload (coarse, codebooks, codes_df); tensors rebuilt bit-exact."""
    coarse_rows = spark.read.parquet(os.path.join(path, "coarse")).collect()
    coarse = np.array(
        [r["centroid"] for r in sorted(coarse_rows, key=lambda r: r["cell"])],
        dtype=np.float64,
    )
    cb_rows = spark.read.parquet(os.path.join(path, "codebooks")).collect()
    m = max(r["subspace"] for r in cb_rows) + 1
    k = max(r["code"] for r in cb_rows) + 1
    ds = len(cb_rows[0]["centroid"])
    codebooks = np.zeros((m, k, ds), dtype=np.float64)
    for r in cb_rows:
        codebooks[r["subspace"], r["code"]] = r["centroid"]
    codes_df = spark.read.parquet(os.path.join(path, "codes"))
    return coarse, codebooks, codes_df
