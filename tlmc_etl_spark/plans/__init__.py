"""Query catalog. Importing this package registers every plan."""

from tlmc_etl_spark.plans import (  # noqa: F401
    curation2,
    delivery,
    ext,
    incremental,
    lm,
    multimodal,
    relational,
    relational2,
    relational3,
    serving,
    storage,
    temporal,
    text,
    tpch_shapes,
    vectors,
)
from tlmc_etl_spark.plans.registry import QUERIES, all_oracles, all_queries

__all__ = ["QUERIES", "all_queries", "all_oracles"]
