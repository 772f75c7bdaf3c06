"""Filesystem-as-table: build a file-manifest DataFrame from a directory
tree, the engine's primary-scan equivalent of the reference's 2-level
circle/album walk (info_scanner_ph1.py:505-522; SURVEY.md §1.1
'Filesystem-as-table').

The listing happens once (driver-side os.walk for a local root — on a
cluster this is a distributed `binaryFile`-style listing or an object-store
inventory table); everything downstream is pure DataFrame ops on the
manifest, which is the design point: scan the tree once, then let Catalyst
prune/push down on a columnar table instead of re-stat-ing files per stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "path string, circle_dir string, album_dir string, rel_dir string, "
    "filename string, ext string, size_bytes long, mtime_s long"
)


def scan_tree(spark: SparkSession, root: str) -> DataFrame:
    """Walk `root` (layout `<circle>/<album>/...`) into a manifest table."""
    rows = []
    root = os.path.abspath(root)
    for dirpath, _dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        parts = [] if rel == "." else rel.split(os.sep)
        circle = parts[0] if len(parts) >= 1 else None
        album = parts[1] if len(parts) >= 2 else None
        subdir = os.sep.join(parts[2:]) if len(parts) > 2 else None
        for name in sorted(filenames):
            p = os.path.join(dirpath, name)
            st = os.stat(p)
            _, dot, ext = name.rpartition(".")
            rows.append(
                (
                    p,
                    circle,
                    album,
                    subdir,
                    name,
                    ext.lower() if dot else "",
                    st.st_size,
                    int(st.st_mtime),
                )
            )
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


AUDIO_EXTS = ["flac", "mp3", "wav", "wv", "m4a"]
ASSET_EXTS = ["jpg", "jpeg", "png", "pdf", "log", "cue", "txt"]


def with_kind(manifest: DataFrame) -> DataFrame:
    """Extension-predicate projection (disc_scanner.py:16,
    extract_plan.py:39): audio / asset / other, as a derived column."""
    return manifest.withColumn(
        "kind",
        F.when(F.col("ext").isin(AUDIO_EXTS), "audio")
        .when(F.col("ext").isin(ASSET_EXTS), "asset")
        .otherwise("other"),
    )


def album_audio_dirs(manifest: DataFrame) -> DataFrame:
    """Recursive track search (disc_scanner.py:204-226): per-album map of
    directories containing audio, with counts — groupBy, not re-walking."""
    return (
        with_kind(manifest)
        .filter(F.col("kind") == "audio")
        .groupBy("circle_dir", "album_dir", "rel_dir")
        .agg(
            F.count(F.lit(1)).alias("n_audio"),
            F.sum("size_bytes").alias("audio_bytes"),
            F.sort_array(F.collect_list("filename")).alias("files"),
        )
    )
