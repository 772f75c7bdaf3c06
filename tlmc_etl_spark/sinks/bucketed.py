"""Bucketed-table sink: pre-shuffled storage so co-keyed joins and
aggregations read WITHOUT an exchange.

At 100 TB the dominant cost of the catalog's recurring joins (tracks ×
probe results, chunks × track metadata, pairs × signatures) is the
shuffle — and it is the SAME shuffle every run. Bucketing pays it once
at write time: `bucketBy(n, key)` hash-partitions rows into a fixed
bucket layout the reader exposes as its output partitioning, so a join
of two tables co-bucketed on the join key (same bucket count) starts
from matching distributions and Catalyst plans it with zero Exchange —
the DataFrame-native equivalent of the reference keeping its tables
pre-sorted by id. `sortBy` inside the bucket additionally lets the
sort-merge join skip its per-task sort.

Gated by tests/test_bucketed_join.py: the co-bucketed join plan must
contain no Exchange; the identical unbucketed join must contain one —
proving the layout, not the optimizer's mood, removed the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist `df` as a managed table bucketed (and optionally
    bucket-sorted) on `key`. Overwrites an existing table of the name."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
