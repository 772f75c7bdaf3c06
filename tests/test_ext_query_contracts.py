"""Query-level contracts for ext entries whose operators are tested
elsewhere — these run the REGISTERED callable by name, so a wiring
regression (wrong params, renamed column, broken composition) fails here
even while the underlying operator suites stay green.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tlmc_etl_spark.plans import QUERIES


def test_simhash_dedup_pairs_are_canonical_and_within_radius(spark, sf_dir):
    rows = QUERIES["simhash_prodhash"].fn(spark, sf_dir).collect()
    assert rows, "no simhash candidate pairs at test scale"
    for r in rows:
        assert r["id_a"] < r["id_b"], "pairs must be canonical (a < b)"
        assert 0 <= r["hamming"] <= 16, f"radius contract violated: {r}"


@pytest.mark.parametrize(
    "name,floor",
    [
        # portable primaries: hash-medoid codebooks with ZERO k-means
        # iterations (the price of SQL replayability) — the audit must
        # still clearly beat random-codebook recon (~0 mean cosine for
        # 64-dim), but it cannot match trained codebooks
        ("pq_reconstruction_audit", 0.2),
        ("opq_pq_recon_audit", 0.2),
        # production k-means forms keep the trained-quality floor
        ("pq_recon_kmeans", 0.5),
        ("opq_pq_recon_kmeans", 0.5),
    ],
)
def test_pq_audits_cover_every_vector_with_bounded_cosine(spark, sf_dir, name, floor):
    df = QUERIES[name].fn(spark, sf_dir)
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("recon_cosine").alias("mn"),
        F.max("recon_cosine").alias("mx"),
        F.mean("recon_cosine").alias("avg"),
    ).first()
    assert stats["n"] == n_vec, "audit must emit one row per vector"
    assert -1.0 <= stats["mn"] and stats["mx"] <= 1.0
    assert stats["avg"] > floor, f"{name}: mean recon {stats['avg']:.3f} below floor"


def test_two_stage_similarity_query_emits_dense_ranked_neighbors(spark, sf_dir):
    rows = QUERIES["two_stage_similarity"].fn(spark, sf_dir).collect()
    by_anchor: dict[int, list[int]] = {}
    for r in rows:
        assert r["anchor"] != r["neighbor"]
        by_anchor.setdefault(r["anchor"], []).append(r["rank"])
    assert len(by_anchor) == 50, "one anchor per pseudo-track"
    for ranks in by_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_approx_percentiles_track_exact_within_rank_error(spark, sf_dir):
    exact = {
        r["o_orderpriority"]: r
        for r in QUERIES["order_value_percentiles"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["o_orderpriority"]: r
        for r in QUERIES["order_value_percentiles_approx"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for key, a in approx.items():
        e = exact[key]
        assert a["n_orders"] == e["n_orders"]
        assert a["p50"] <= a["p90"] <= a["p99"], a
        # accuracy 10000 over n<=10k rows per group at test sf => the GK
        # summary is effectively exact; allow a loose 2% value slack anyway
        for q in ("p50", "p90", "p99"):
            assert abs(a[q] - e[q]) <= 0.02 * abs(e[q]) + 1e-6, (key, q, a[q], e[q])


def test_portable_hll_estimate_accuracy(spark, sf_dir):
    """The xengine HLL twin must be a real estimator, not just
    oracle-consistent: relative error within 3 standard errors of the
    m=256 sketch (3 * 1.04/sqrt(256) ~ 19.5%)."""
    from tlmc_etl_spark.plans import QUERIES

    for r in QUERIES["hll_user_rollup"].fn(spark, sf_dir).collect():
        rel = abs(r["est_hll"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert rel < 0.195, f"{r['event_type']}: rel err {rel:.3f}"
