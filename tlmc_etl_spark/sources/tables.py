"""Parquet table loaders for the driver's synthetic star schema.

The reference's primary source is a filesystem tree turned into a manifest
(info_scanner_ph1.py:505-522 in the reference); here every source is already
a columnar table, which is the shape the rebuild targets anyway (SURVEY.md
§7.1 bronze layer). Loads are plain `spark.read.parquet` so Catalyst gets
predicate pushdown + column pruning on every scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to always broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects; read nanos as long and convert to a microsecond
    timestamp (truncation — sub-microsecond precision is below anything the
    engine exposes). The legacy flag is per-session and runtime-settable.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("bigint")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL-first plans."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def table_row_count(sf_dir: str, name: str) -> int:
    """Row count from parquet FOOTER metadata — no Spark job.

    Regime-routing operators (lsh_topk's IVF takeover) need the corpus
    size before building the plan; counting through Spark schedules an
    eager job per call. The footer already stores the exact count (per
    file, summed over part files for a directory table)."""
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows
