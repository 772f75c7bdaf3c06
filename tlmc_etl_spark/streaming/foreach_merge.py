"""Streaming upsert: foreachBatch + keyed merge into a parquet target.

The reference's incremental stages end in an idempotent keyed write
(temp-table merge, journal.py + the MERGE pattern in sinks/jdbc.py).
For a stream, Structured Streaming's exactly-once contract applies to
SINKS it controls; arbitrary targets get it from the foreachBatch
pattern: each micro-batch arrives with an epoch id, and the merge is
written so replaying the same epoch converges to the same state
(last-write-wins by key) — at-least-once delivery + idempotent merge =
effectively-once.

The parquet merge here is read-modify-swap (union, keep the newest row
per key, write aside, swap into place) — the lakehouse-table MERGE
shape; on Delta/Iceberg the same callback body becomes a single MERGE
INTO. Newest = max (epoch, seq) per key, so replays and within-batch
duplicates both collapse deterministically.

The swap is crash-safe: the previous snapshot is renamed to
`<target>.old` BEFORE the new one is renamed into place, and `.old` is
deleted only after the publish — so at every instant at least one
complete snapshot exists on disk. `_recover_target()` (called before
every read and by the stream starter) rolls `.old` forward or discards
it, whichever side of the swap the crash landed on. This matters
because the stream checkpoint has already committed earlier epochs:
the journal will NOT be replayed to rebuild lost state, so the merge
target must never have a moment of being the only copy and destroyed.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _recover_target(target: str) -> None:
    """Heal a crash that landed mid-swap. Invariant of the publish
    sequence: `<target>.old` only exists while a swap is in flight.
    If the crash hit after the old snapshot was moved aside but before
    the new one landed (target missing), roll `.old` back; if it hit
    after the new snapshot landed but before cleanup (both present),
    the new one is complete — discard `.old`."""
    old = target.rstrip("/") + ".old"
    if not os.path.isdir(old):
        return
    if os.path.isdir(target):
        shutil.rmtree(old)
    else:
        os.rename(old, target)


def merge_batch_into_parquet(
    spark: SparkSession,
    batch: DataFrame,
    epoch_id: int,
    target: str,
    key_col: str,
    seq_col: str,
) -> None:
    """Idempotent keyed merge of one micro-batch into a parquet dir."""
    _recover_target(target)
    staged = batch.withColumn("__epoch", F.lit(int(epoch_id)))
    if os.path.isdir(target) and any(
        f.endswith(".parquet") for f in os.listdir(target)
    ):
        current = spark.read.parquet(target)
        staged = current.unionByName(staged)
    w = Window.partitionBy(key_col).orderBy(
        F.col("__epoch").desc(), F.col(seq_col).desc()
    )
    merged = (
        staged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    tmp = target.rstrip("/") + ".staging"
    old = target.rstrip("/") + ".old"
    merged.write.mode("overwrite").parquet(tmp)
    # publish: park the old snapshot, land the new one, then clean up.
    # A complete snapshot exists at target or target.old at all times;
    # _recover_target() resolves whichever state a crash leaves behind.
    if os.path.isdir(target):
        os.rename(target, old)
    os.rename(tmp, target)
    if os.path.isdir(old):
        shutil.rmtree(old)


def start_journal_merge_stream(
    spark: SparkSession,
    journal_path: str,
    target: str,
    checkpoint: str,
    key_col: str = "item_id",
    seq_col: str = "pos",
):
    """Tail a JSONL journal (streaming/source.py) and upsert parsed rows
    into a keyed parquet target; returns the started query. One merge
    per micro-batch; availableNow-friendly."""
    from tlmc_etl_spark.streaming.source import register_journal_tail_source

    register_journal_tail_source(spark)
    _recover_target(target)
    parsed = (
        spark.readStream.format("journal_tail")
        .option("path", journal_path)
        .load()
        .select(
            F.get_json_object("line", "$.item_id").alias(key_col),
            F.get_json_object("line", "$.value").cast("double").alias("value"),
            "pos",
        )
        .filter(F.col(key_col).isNotNull())
    )
    return (
        parsed.writeStream.foreachBatch(
            lambda b, e: merge_batch_into_parquet(spark, b, e, target, key_col, seq_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
