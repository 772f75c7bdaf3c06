"""Generated-literal oracles for the `_kmeans` ANN variants
(plans/ann_kmeans_oracles.py).

Two properties keep the pattern honest:
 1. literal <-> computed agreement: re-running the exact training the
    production queries run at the pinned sf reproduces the committed
    fixture bit-for-bit (seeded numpy k-means on a deterministic
    take-ordered sample is bit-stable; repr(float) JSON round-trips IEEE
    doubles losslessly). A drift in training code or data fails HERE,
    not as a silent oracle mismatch at driver time.
 2. the oracles are attached and pinned: the five `_kmeans` registry
    entries carry both the SQL and oracle_sf_dir, so every parity
    harness runs them at the sf the literals were converged on.

The value comparison itself (Spark vs DuckDB serving replay) runs with
the rest of the registry in tests/test_oracle_parity.py, which resolves
the pinned directory per query.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tlmc_etl_spark.plans import QUERIES
from tlmc_etl_spark.plans.ann_kmeans_oracles import (
    ORACLE_SF_DIR,
    load_artifacts,
)

KMEANS_NAMES = [
    "ivf_ann_topk_kmeans",
    "ivf_pq_topk_kmeans",
    "pq_adc_topk_kmeans",
    "pq_recon_kmeans",
    "opq_pq_recon_kmeans",
]

needs_sf = pytest.mark.skipif(
    not os.path.isdir(ORACLE_SF_DIR), reason=f"{ORACLE_SF_DIR} absent"
)


def test_fixture_present_and_oracles_attached():
    art = load_artifacts()
    assert art is not None, "fixtures/kmeans_sf0_01.json missing"
    assert art["sf_dir"] == ORACLE_SF_DIR
    for name in KMEANS_NAMES:
        q = QUERIES[name]
        assert q.oracle is not None, f"{name} lost its generated oracle"
        assert q.oracle_sf_dir == ORACLE_SF_DIR, f"{name} not sf-pinned"


def test_fixture_shapes():
    art = load_artifacts()
    coarse = np.array(art["coarse16"])
    cb = np.array(art["cb_m8_k16"])
    ocb = np.array(art["opq_cb_m8_k16"])
    R = np.array(art["opq_R"])
    assert coarse.shape == (16, 64)
    assert cb.shape == (8, 16, 8) and ocb.shape == (8, 16, 8)
    assert R.shape == (64, 64)
    # R orthogonal (rotation preserves cosines by construction)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-9)
    # coarse centroids unit-norm (kmeans_centroids normalizes each iter)
    assert np.allclose(np.linalg.norm(coarse, axis=1), 1.0, atol=1e-12)


@needs_sf
def test_literals_match_recomputed_training(spark):
    """The agreement gate: the committed literals ARE what the production
    queries' training computes at the pinned sf, bitwise."""
    from tools.gen_kmeans_literals import compute_artifacts

    art = load_artifacts()
    fresh = compute_artifacts(spark, ORACLE_SF_DIR)
    for key in ("coarse16", "cb_m8_k16", "opq_R", "opq_cb_m8_k16"):
        a = np.array(art[key])
        b = np.array(fresh[key])
        assert a.shape == b.shape, key
        assert np.array_equal(a, b), (
            f"{key}: committed literals diverge from recomputed training — "
            "regenerate with tools/gen_kmeans_literals.py"
        )
