"""Double-run determinism: the driver's correctness gate hashes values,
so any nondeterminism — sample order, seed drift, subprocess timing,
partition-layout dependence — flakes the whole round. Every query with a
sampling / seeded / subprocess / iterative component must produce
IDENTICAL rows on a second run in the same session.
"""

from __future__ import annotations

import pytest

from tlmc_etl_spark.plans import QUERIES

TRICKY = [
    "pq_adc_topk_kmeans",       # seeded k-means on a hash-ordered sample
    "ivf_pq_topk_kmeans",       # coarse quantizer + codes
    "opq_pq_recon_kmeans",      # eigendecomposition + sign fix
    "embedding_near_dup_lsh_hi",  # seeded hyperplanes, multi-table OR
    "kde_bandwidth_calibration",  # capped member sample
    "subprocess_probe_scan",    # real child processes
    "subprocess_loudness_scan",  # real child processes + gain formula
    "archive_index_scan",       # real child processes + relational classify
    "catalog_incremental_rebuild",  # partitioned recompute + carry
    "two_stage_weighted_similarity",  # background sample -> weights -> rerank
    "sequence_packing",         # sequential greedy per shard
]


def _rows(spark, sf_dir, name):
    return sorted(
        tuple(r) for r in QUERIES[name].fn(spark, sf_dir).collect()
    )


@pytest.mark.parametrize("name", TRICKY)
def test_second_run_is_bit_identical(spark, sf_dir, name):
    first = _rows(spark, sf_dir, name)
    second = _rows(spark, sf_dir, name)
    assert first == second, f"{name}: values drifted between runs"
    assert first, f"{name}: produced no rows — determinism gate is vacuous"
