"""SparkSession factory.

Local mode is a single JVM; the config mirrors what a cluster deployment
would set per-executor so plans tested here carry over (AQE on, shuffle
partitions sized to cores, Arrow enabled for pandas-UDF exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tlmc-etl-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is byte-based and blind to CPU cost: a few hundred
        # KB of shuffle feeding a pandas-UDF stage would collapse to ONE
        # task (measured 8x slowdown on the Hungarian match). minPartitionSize
        # 1b + parallelismFirst makes AQE target bytes/parallelism instead of
        # the 1 MiB floor, so small-but-CPU-heavy stages keep every core.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
