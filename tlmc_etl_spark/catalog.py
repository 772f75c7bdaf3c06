"""SQL surface: every base table and every registered query as a view.

A reference user's day-to-day interface is "run a query over the
catalog"; this module makes the whole engine reachable from plain
`spark.sql(...)`:

  register_tables(spark, sf_dir)        -> base tables as temp views
  register_query_views(spark, sf_dir)   -> each catalog query as view
                                           q_<name> (lazy — Catalyst
                                           inlines the plan where used)

Views are lazy DataFrames, not materializations: selecting from
`q_doc_exact_dedup` compiles the query's full plan into the consumer's
own — filters the user writes on top push INTO the underlying scans,
and Catalyst prunes columns across the view boundary exactly as if the
user had composed DataFrames directly. This is the Spark-native
equivalent of the reference's planned "no Python serving component"
SQL path (SIMILARITY-PLAN.md:9-28): precomputed shapes exposed to a
SQL-only consumer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from tlmc_etl_spark.sources.tables import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every base parquet table as a temp view; returns names."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES)


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register catalog queries as views `q_<name>`; returns view names.

    `names=None` registers every query in the catalog. Queries that
    drive sinks or child processes (archive/probe/loudness scans, shard
    lifecycles) build their fixture scaffolding at plan-construction
    time, so registering them here is deliberate and cheap-per-view but
    not free in aggregate; pass an explicit list when only the
    relational surface is wanted.
    """
    from tlmc_etl_spark.plans import QUERIES

    out = []
    for name in names if names is not None else sorted(QUERIES):
        QUERIES[name].fn(spark, sf_dir).createOrReplaceTempView(f"q_{name}")
        out.append(f"q_{name}")
    return out
