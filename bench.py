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
    # §2.11 relational core
    "pricing_summary",
    "mode_vote",
    "three_way_enrich",
    "topk_per_group",
    "gap_fill_numbering",
    "dedup_keep_winner",
    "delta_detect",
    "sessionize_events",
    "event_resample_ffill",
    "rank_merge_full_outer",
    "hls_ladder_worklist",
    "semi_join_gather",
    "hierarchy_rollup_totals",
    "order_value_percentiles",
    "shipping_priority_topk",
    "nation_balance_moments",
    "local_supplier_volume",
    # training-data pipeline ops
    "doc_exact_dedup",
    "substring_span_dedup",
    "dataset_split_assign",
    "hll_user_rollup",
    "doc_chunking",
    "sequence_packing",
    "corpus_mix_sample",
    "curation_lifecycle",
    "benchmark_contamination",
    "minhash_lsh_dedup",
    "doc_dedup_clusters",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "embedding_near_dup_lsh_hi",
    "multimodal_features",
    "frame_sample_plan",
    # similarity pipeline
    "cosine_topk",
    "two_stage_similarity",
    "kde_bandwidth_calibration",
    # composed §3.1→§3.2 lifecycle (catalog → similarity → shard sink)
    "lifecycle_similar_shards",
]


def loadavg() -> list[float]:
    try:
        return [float(x) for x in open("/proc/loadavg").read().split()[:3]]
    except Exception:
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    load_start = loadavg()
    # The shared host's external load distorts absolute walls 2-8x (observed
    # round 3: an unchanged tree re-measured 17.8s -> 113s under loadavg 17).
    # Absolute walls are only comparable across runs at similar load; the
    # spark_over_duckdb ratio is contention-normalized (DuckDB runs in the
    # same process under the same load) and is the number the suite is
    # graded on.
    if load_start and load_start[0] > 8.0:
        print(
            f"WARN: loadavg {load_start[0]:.1f} > 8 — absolute walls will be "
            "inflated; trust only spark_over_duckdb from this run",
            file=sys.stderr,
        )
    spark = get_spark("tlmc-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    # Warm the JVM: run every headline plan once at the smallest sf so
    # whole-stage-codegen classes and parquet footers are compiled/cached
    # before timing — the bench measures steady-state throughput, not JIT.
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name].fn(spark, warm_dir).count()
        except Exception:
            QUERIES["pricing_summary"].fn(spark, sf_dir).count()

    # Steady-state timing: best of 2 full materializations per query (the
    # second run still re-reads parquet and re-executes the whole plan; only
    # JIT/codegen/footer caches are warm — the same regime a long-lived
    # cluster session runs in).
    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)

    # BASELINE.md's BENCH target: the relational suite within 2x of the
    # equivalent DuckDB wall time on the same machine. Measure that DuckDB
    # wall here (same oracle SQL, same parquet, best of 2) so every
    # BENCH_r{N}.json carries the ratio it is graded on.
    duckdb_wall, matched_wall = None, None
    try:
        import duckdb

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "__spark_entry__", os.path.join(os.path.dirname(os.path.abspath(__file__)), "__spark_entry__.py")
        )
        entry_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry_mod)
        oracles = entry_mod.oracle_sql()
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        matched = [n for n in names if n in oracles]
        dd = 0.0
        for name in matched:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
            dd += best
        duckdb_wall = round(dd, 3)
        matched_wall = round(sum(times[n] for n in matched), 3)
    except Exception:
        pass

    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "loadavg_start": load_start,
        "loadavg_end": loadavg(),
    }
    if duckdb_wall is not None:
        out["duckdb_wall"] = duckdb_wall
        out["spark_matched_wall"] = matched_wall
        out["spark_over_duckdb"] = round(matched_wall / duckdb_wall, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
