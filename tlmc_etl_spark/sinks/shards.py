"""Sharded sinks with per-shard resume and the similar_track CSV format.

Reference: similarity results are written as 10k-anchor CSV shards via
tmp+rename with per-shard resume — a crashed run re-emits only missing
shards (precompute_similar_tracks.py:244-275); the DB load consumes shards
with header exactly `anchor_id,neighbor_id,rank,score`
(SimilarTrackProcessor.cs:62-67).

Spark mapping: a shard is a hash partition of the anchor key; resume =
skip shard ids already present in the output directory (an anti-join on
the completed shard list, same contract as streaming/journal.py). Writes
go through Spark's job-commit protocol, which is the tmp+rename pattern
per task — readers never observe partial shards.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIMILAR_TRACK_COLS = ["anchor_id", "neighbor_id", "rank", "score"]


def assign_shard(
    df: DataFrame, key_col: str, n_shards: int, portable: bool = False
) -> DataFrame:
    """Deterministic shard id from the anchor key (xxhash64 — stable
    across executors/runs, the blake2b%N analogue, hls_runner.py:53-66).

    `portable=True` swaps in the cross-engine 60-bit md5-prefix hash
    (operators/dedup.portable_hash60) so a DuckDB oracle can replay the
    shard mapping — the xengine convention applied to the sink. The
    production default stays on the fast hash."""
    if portable:
        from tlmc_etl_spark.operators.dedup import portable_hash60

        # cast to string so the hash (md5: string/binary only) accepts any
        # key type and always matches the documented key::VARCHAR DuckDB
        # replay — a numeric key must not analyze-fail or hash differently
        key = portable_hash60(F.col(key_col).cast("string"))
    else:
        key = F.xxhash64(F.col(key_col))
    return df.withColumn("shard", F.pmod(key, F.lit(n_shards)))


def existing_shards(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    found = set()
    for name in os.listdir(out_dir):
        if name.startswith("shard="):
            try:
                found.add(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return found


def write_shards_resumable(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    n_shards: int,
    fmt: str = "csv",
    portable: bool = False,
    sort_cols: list[str] | None = None,
) -> list[int]:
    """Write df as `shard=K/` partitions, skipping shards already present.

    Returns the shard ids written this run. Equivalent semantics to the
    reference's per-shard resume: a rerun after a partial failure emits
    only the missing shards. Each shard directory appears atomically
    (job-commit rename), so 'present' implies 'complete'.

    `sort_cols` orders rows WITHIN each shard file. The sort must sit
    here, after the shard repartition: a sort applied upstream of the
    exchange is scrambled by the shuffle — round 16 caught the similar
    track sink paying a full pre-shuffle sort of the output and still
    emitting unordered shard files (the loader contract says ordered).
    """
    sharded = assign_shard(df, key_col, n_shards, portable=portable)
    done = existing_shards(out_dir)
    todo = sorted(set(range(n_shards)) - done)
    if not todo:
        return []
    pending = sharded.filter(F.col("shard").isin([int(s) for s in todo]))
    placed = pending.repartition("shard")
    if sort_cols:
        # shard leads the sort so two shards hashed into one partition
        # still produce internally ordered files under partitionBy
        placed = placed.sortWithinPartitions("shard", *sort_cols)
    writer = placed.write.partitionBy("shard").mode("append")
    if fmt == "csv":
        writer.option("header", True).csv(out_dir)
    else:
        writer.parquet(out_dir)
    return todo


def write_similar_track_shards(
    ranked: DataFrame, out_dir: str, n_shards: int = 16, portable: bool = False
) -> list[int]:
    """similar_track shard sink: columns pinned to the loader contract
    (anchor_id,neighbor_id,rank,score — SimilarTrackProcessor.cs:62-67),
    rows ordered (anchor, rank) within each shard."""
    cols = ranked.select(
        F.col("anchor").cast("string").alias("anchor_id"),
        F.col("neighbor").cast("string").alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").cast("double").alias("score"),
    )
    # ordering is applied INSIDE the sink after the shard exchange
    # (write_shards_resumable.sort_cols) — the previous pre-shuffle
    # sortWithinPartitions was a full wasted pass: the shard repartition
    # scrambled it and the emitted files were unordered
    return write_shards_resumable(
        cols, "anchor_id", out_dir, n_shards, fmt="csv", portable=portable,
        sort_cols=["anchor_id", "rank"],
    )


def read_similar_track_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    # Explicit schema: the loader contract pins the columns, so the
    # header-probe pass a schemaless csv read schedules is pure waste.
    # Types match the schemaless read exactly (data columns arrive as
    # strings with inferSchema off; the shard partition column was
    # path-inferred int) — consumers' casts are unchanged.
    return (
        spark.read.option("header", True)
        .schema(
            "anchor_id string, neighbor_id string, rank string, "
            "score string, shard int"
        )
        .csv(out_dir)
    )


def atomic_overwrite_parquet(df: DataFrame, out_dir: str) -> None:
    """All-or-nothing artifact replacement (cue_scanner.py:134-144 tmp +
    os.replace): write beside, swap, drop old. A reader holding the old
    path keeps a consistent snapshot; the swap is a directory rename."""
    tmp = out_dir.rstrip("/") + ".__tmp__"
    old = out_dir.rstrip("/") + ".__old__"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(out_dir):
        os.rename(out_dir, old)
        os.rename(tmp, out_dir)
        shutil.rmtree(old)
    else:
        os.rename(tmp, out_dir)
