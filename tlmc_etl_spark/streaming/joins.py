"""Stream-stream interval join: the attribution shape (view → click
within N minutes, request → response, probe → result) as a genuine
two-unbounded-sides join.

The reference pairs related records only in batch (its journals join
after the fact); a stream runtime must pair them ONLINE, which is
Spark's StreamingSymmetricHashJoin: both sides buffer keyed state, and
the join CONDITION's time bound plus both watermarks tell the engine
exactly when a buffered row can never match again and is evicted. An
unbounded-state stream join (no time bound) is the 100 TB anti-pattern
this module's API makes unrepresentable: `within` is a required
argument and both inputs get watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "15 minutes",
    late: str = "30 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Join two event streams on `key` where the right event lands in
    (left.ts, left.ts + within]. Columns come back prefixed l_/r_.

    State bound: a left row is droppable once the watermark passes
    left.ts + within; a right row once it passes right.ts — Spark derives
    both from the condition, so state size follows the interval and the
    arrival rate, never the stream length. With join_type="leftOuter"
    the unmatched left rows emit (with null r_*) only AFTER the
    watermark closes their interval — a drain that never advances the
    watermark past the last left.ts + within withholds them (the
    documented outer-join emission semantics, not a bug).
    """
    lt = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", late)
    rt = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
    ).withWatermark("r_ts", late)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return lt.join(rt, cond, join_type).select(
        F.col("l_key").alias("user_id"),
        "l_event_id",
        "l_ts",
        "r_event_id",
        "r_ts",
        (F.col("r_ts").cast("double") - F.col("l_ts").cast("double")).alias("lag_sec"),
    )
