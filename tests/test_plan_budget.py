"""Shuffle-budget regression gate for every headline query.

Each entry pins the number of hash-partition exchanges in the query's
static plan — the scale-cost contract of the round it was designed in.
A code change that keeps results correct but adds a shuffle (lost
broadcast, un-reused partitioning, accidental distinct) fails here with
the offending query named, instead of surfacing as a silent wall-clock
regression three rounds later.

Budgets are exact ceilings measured at the design plan; lowering one is
an improvement (update it), exceeding one needs a design justification,
not just a green oracle row. `lifecycle_similar_shards` is excluded:
its plan embeds a mid-DAG sink materialization whose downstream
read-back re-lists the whole pipeline.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tlmc_etl_spark.plans import QUERIES

SHUFFLE_BUDGET = {
    "pricing_summary": 1,
    "mode_vote": 2,
    "three_way_enrich": 0,
    "topk_per_group": 1,
    "gap_fill_numbering": 1,
    "dedup_keep_winner": 1,
    "delta_detect": 2,
    "sessionize_events": 1,
    "event_resample_ffill": 2,
    "rank_merge_full_outer": 4,
    "hls_ladder_worklist": 0,
    "semi_join_gather": 0,
    "hierarchy_rollup_totals": 1,
    "order_value_percentiles": 1,
    "shipping_priority_topk": 1,
    "nation_balance_moments": 1,
    "local_supplier_volume": 1,
    "doc_exact_dedup": 1,
    "substring_span_dedup": 3,
    "dataset_split_assign": 0,
    "hll_user_rollup": 5,
    "doc_chunking": 0,
    "sequence_packing": 1,
    "corpus_mix_sample": 0,
    "curation_lifecycle": 2,
    "benchmark_contamination": 1,
    "minhash_lsh_dedup": 2,
    "doc_dedup_clusters": 0,  # iterative stages run via checkpoints, not this plan
    "embedding_near_dup": 0,
    "embedding_near_dup_lsh": 0,  # candidate join rides broadcast at this sf
    "embedding_near_dup_lsh_hi": 0,
    "multimodal_features": 0,
    "frame_sample_plan": 0,
    "cosine_topk": 1,
    "two_stage_similarity": 3,
    "kde_bandwidth_calibration": 2,
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_headline_query_stays_within_shuffle_budget(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    n = buf.getvalue().count("Arguments: hashpartitioning")
    assert n <= SHUFFLE_BUDGET[name], (
        f"{name}: {n} shuffles, budget {SHUFFLE_BUDGET[name]} — a new exchange "
        "entered this plan; justify and update the budget or fix the plan"
    )
