"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query on sf0.001; `queries()` exposes the
full catalog (tlmc_etl_spark/plans); `oracle_sql()` exposes the DuckDB
oracle for every relational (t2) query. Ext operators (hash-dependent or
vector/fuzzy semantics a SQL oracle can't express) appear in `queries()`
only and are covered by differential/property tests under tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tlmc_etl_spark.plans import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tlmc_etl_spark.plans.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each relational query."""
    return all_oracles()
