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

# must import AFTER the plan modules: attaches generated-literal oracles
# to the already-registered `_kmeans` queries
from tlmc_etl_spark.plans import ann_kmeans_oracles  # noqa: F401, E402
from tlmc_etl_spark.plans.registry import QUERIES, all_oracles, all_queries

__all__ = ["QUERIES", "all_queries", "all_oracles"]
