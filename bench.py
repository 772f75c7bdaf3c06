"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query
wall times. Each query is fully materialized via a count-collect of the
result (no toPandas transfer cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tlmc_etl_spark.plans import QUERIES
from tlmc_etl_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "mode_vote",
    "three_way_enrich",
    "topk_per_group",
    "gap_fill_numbering",
    "dedup_keep_winner",
    "delta_detect",
    "sessionize_events",
    "doc_exact_dedup",
    "cosine_topk",
    "rank_merge_full_outer",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark("tlmc-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    # warm the JVM + parquet footer caches with the cheapest query
    QUERIES["pricing_summary"].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
