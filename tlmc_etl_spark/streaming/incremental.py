"""Composed incremental run: journal_tail → per-batch catalog rebuild →
keyed gold-table merge, as ONE Trigger.AvailableNow streaming job.

This closes SURVEY §2.9's "incremental = streaming file source" mapping
end-to-end: the reference's cadence — poll the change journal, re-run
the pipeline for touched albums, upsert the gold table, stop
(journal.py:48-126 + id_assign_and_merge.py:74-118) — becomes a
Structured Streaming job whose checkpoint carries the journal offset.
`Trigger.AvailableNow` drains everything appended since the last run
and stops, which IS the reference's batch-cron contract, with
exactly-once delivery across crashes inherited from the journal_tail
offset model (streaming/source.py) instead of hand-rolled bookkeeping.

Each micro-batch:
  1. parses its journal lines to changed (circle_dir, album_dir) keys;
  2. re-runs the FULL catalog pipeline (pipelines/metadata.build_catalog)
     on just those albums — sound because albums are independent by
     construction (classification, votes, gap-fill never cross album
     boundaries — the same invariant catalog_incremental_rebuild's
     oracle proves);
  3. merges the rebuilt release rows into the parquet gold table by
     album key, last-write-wins by epoch (the crash-safe
     park-old/land-new swap from streaming/foreach_merge.py).

Replays converge: re-running an epoch rebuilds the same albums to the
same rows (deterministic pipeline), and the keyed merge collapses them
— at-least-once delivery + idempotent merge = effectively-once. The
restart-mid-stream invariant (incremental stream ≡ one-shot full
rebuild) is gated in tests/test_incremental_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RELEASE_COLS = [
    "circle_dir",
    "album_dir",
    "album_name",
    "release_year",
    "release_month",
    "release_day",
    "catalog_number",
    "convention",
    "album_artist",
    "disc_count",
    "track_count",
]


def rebuild_releases(manifest: DataFrame, probe: DataFrame) -> DataFrame:
    """Full catalog pipeline → flat release rows (the gold-table shape;
    same projection as plans/ext.py catalog_incremental_rebuild)."""
    from tlmc_etl_spark.pipelines.metadata import build_catalog

    return build_catalog(manifest, probe).release.select(
        *RELEASE_COLS,
        F.concat_ws("|", F.col("needs_review_reasons")).alias(
            "needs_review_reasons"
        ),
    )


def start_incremental_catalog_stream(
    spark: SparkSession,
    journal_path: str,
    manifest: DataFrame,
    probe: DataFrame,
    target: str,
    checkpoint: str,
    max_bytes_per_batch: int | None = None,
):
    """Drain the album-change journal and upsert the gold release table.

    Journal lines: {"circle_dir": ..., "album_dir": ...} (one per
    touched album; duplicates within or across batches are fine — the
    rebuild is deterministic and the merge keyed). Returns the started
    query; `.awaitTermination()` completes when the journal is drained
    (availableNow).

    `max_bytes_per_batch` forwards journal_tail's backpressure bound: a
    large catch-up delta drains as a SEQUENCE of bounded micro-batches
    instead of one unbounded batch, which is what makes mid-drain
    recovery per-batch-bounded — a kill loses at most the in-flight
    batch; committed batches never replay (chaos-tested at a 10k-album
    delta in tests/test_incremental_stream.py). Default None keeps the
    single-batch drain for small deltas.

    The bounded path cannot use Trigger.AvailableNow: Python simple
    stream sources have no admission control, so availableNow latches
    its end offset from the FIRST bounded read() and would terminate
    after ONE micro-batch with the rest of the journal silently
    stranded (caught by the chaos test). Instead it runs an unbounded
    processingTime trigger and a monitor thread that stops the query
    once the last completed batch's end offset reaches the
    complete-line EOF latched at start — same drain contract
    ("everything appended before the run"), bounded batches throughout.
    """
    from tlmc_etl_spark.streaming.foreach_merge import (
        _recover_target,
        merge_batch_into_parquet,
    )
    from tlmc_etl_spark.streaming.source import register_journal_tail_source

    register_journal_tail_source(spark)
    _recover_target(target)
    keys = ["circle_dir", "album_dir"]
    reader = spark.readStream.format("journal_tail").option("path", journal_path)
    if max_bytes_per_batch is not None:
        reader = reader.option("max_bytes_per_batch", str(max_bytes_per_batch))
    parsed = (
        reader.load()
        .select(
            F.get_json_object("line", "$.circle_dir").alias("circle_dir"),
            F.get_json_object("line", "$.album_dir").alias("album_dir"),
        )
        .filter(F.col("circle_dir").isNotNull() & F.col("album_dir").isNotNull())
    )

    def rebuild_batch(batch: DataFrame, epoch_id: int) -> None:
        changed = batch.select(*keys).distinct()
        if not changed.take(1):
            return
        sub = manifest.join(F.broadcast(changed), keys, "left_semi")
        release = rebuild_releases(sub, probe).withColumn(
            "album_key", F.concat_ws("/", *keys)
        ).withColumn("__seq", F.lit(0))
        merge_batch_into_parquet(
            spark, release, epoch_id, target, "album_key", "__seq"
        )

    if max_bytes_per_batch is None:
        return (
            parsed.writeStream.foreachBatch(rebuild_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    import ast as _ast
    import json as _json
    import threading
    import time as _time

    from tlmc_etl_spark.streaming.source import complete_eof

    eof0 = complete_eof(journal_path)
    q = (
        parsed.writeStream.foreachBatch(rebuild_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="0 seconds")
        .start()
    )

    def _drained(progress) -> bool:
        # progress reflects the last COMPLETED (committed) batch; its
        # end offset at or past the latched EOF means the pre-run
        # journal is fully drained
        try:
            sources = (
                progress["sources"]
                if isinstance(progress, dict)
                else progress.sources
            )
            src = sources[0]
            end = src["endOffset"] if isinstance(src, dict) else src.endOffset
            if isinstance(end, str):
                # Python-source offsets surface as the DICT REPR
                # ("{'pos': N}"), not JSON — try both
                try:
                    end = _json.loads(end)
                except ValueError:
                    end = _ast.literal_eval(end)
            return int(end["pos"]) >= eof0
        except (KeyError, IndexError, TypeError, ValueError, AttributeError,
                SyntaxError):
            return False

    def _stop_when_drained() -> None:
        while q.isActive:
            p = q.lastProgress
            if p is not None and _drained(p):
                try:
                    q.stop()
                except Exception:
                    pass
                return
            _time.sleep(0.2)

    threading.Thread(target=_stop_when_drained, daemon=True).start()
    return q
