"""Structured Streaming operators: file-source micro-batch ingestion with
event-time windows, watermarked late-data handling, and session windows.

The reference has no true stream runtime (SURVEY.md §2.9) — its journals
are incremental batch — but the rebuilt engine exposes the genuine
streaming path so the same aggregations run on unbounded input:
`Trigger.AvailableNow` drains whatever files exist and checkpoints, which
is exactly the journal-resume contract (new files = pending work,
checkpoint = completed journal) with Spark managing the bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 16,
    max_bytes_per_trigger: str | None = None,
) -> DataFrame:
    """JSONL file source — the streaming twin of the journal reader
    (extract.py:47-61): each new file is a micro-batch of appended lines.

    Backpressure is admission control at the source: `maxFilesPerTrigger`
    bounds a micro-batch by file count (the hls_runner.py:104-141 worklist
    chunking analogue) and `maxBytesPerTrigger` by input bytes — the knob
    that matters when file sizes are skewed. Both cap state growth and
    per-batch latency instead of letting one huge backlog drain as one
    giant batch. Gated by tests/test_streaming.py::TestBackpressure."""
    reader = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return reader.json(input_dir)


def throttled_rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Rate-limited synthetic source: Spark's `rate` source emits
    (timestamp, value) at a capped rows/second — the engine's stand-in for
    upstream API rate limiting (the reference throttles its scrapers
    client-side; in a stream runtime the cap lives at the source)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def windowed_type_counts(events: DataFrame, window: str = "1 hour", late: str = "30 minutes") -> DataFrame:
    """Tumbling event-time counts per event_type with a watermark.

    The watermark bounds state exactly like the reference bounds its
    publish queue — without it, 100 TB of stream state never ages out.
    """
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "1 hour", late: str = "30 minutes") -> DataFrame:
    """True session windows (gap-close semantics) per user — the streaming
    equivalent of plans/incremental.py::sessionize_events."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    late: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup on arbitrary key columns with bounded state.

    The streaming face of the dedup family (doc_exact_dedup is the batch
    face): `dropDuplicatesWithinWatermark` keeps one row per key and ages
    its state out once the watermark passes — duplicates separated by
    more than `late` can both survive, which is the honest contract of
    bounded-state streaming dedup at 100 TB (an unbounded-state
    `dropDuplicates` on a stream never frees a key). Re-ingested journal
    lines, retried uploads, and at-least-once sources all collapse to
    one row inside the lateness horizon.
    """
    return events.withWatermark(ts_col, late).dropDuplicatesWithinWatermark(key_cols)


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Drain all available input into parquet and stop — incremental batch
    over a streaming plan; rerunning after new files arrive processes only
    the delta (checkpoint = completed journal)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
