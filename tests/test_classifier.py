"""doc_quality_classifier: differential gate vs a from-scratch numpy
trajectory, plan-shape contracts, and classifier-sanity properties."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest

from tlmc_etl_spark.plans import QUERIES


def _bucket(token: str, d: int = 16) -> int:
    # independent spelling of the portable 60-bit md5 bucket
    return int(hashlib.md5(f"ngq{token}".encode()).hexdigest()[:15], 16) % d


def _numpy_trajectory(sf_dir: str, d: int = 16, lr: float = 1.0, iters: int = 3):
    import re

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n = len(rows)
    X = np.zeros((n, d + 1))
    y = np.zeros(n)
    ids = np.zeros(n, dtype=np.int64)
    for i, (doc_id, lang, text) in enumerate(rows):
        ids[i] = doc_id
        y[i] = 1.0 if lang == "en" else 0.0
        toks = re.findall(r"[a-z0-9]+", text.lower())
        for t in toks:
            X[i, _bucket(t, d)] += 1.0
        if toks:
            X[i, :d] /= len(toks)
        X[i, d] = 1.0
    w = np.zeros(d + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / n
    scores = 1.0 / (1.0 + np.exp(-(X @ w)))
    return ids, y, scores, w


class TestDifferential:
    def test_scores_match_numpy_trajectory(self, spark, sf_dir):
        ids, y, ref, _w = _numpy_trajectory(sf_dir)
        ref_by_id = dict(zip(ids.tolist(), ref.tolist()))
        got = QUERIES["doc_quality_classifier"].fn(spark, sf_dir).collect()
        assert len(got) == len(ids)
        max_err = 0.0
        for r in got:
            max_err = max(max_err, abs(r["score"] - round(ref_by_id[r["doc_id"]], 6)))
            assert r["label"] == y[ids.tolist().index(r["doc_id"])]
        # summation-order float drift only; scores are rounded to 6dp
        assert max_err <= 2e-6, f"classifier drifted {max_err} from numpy"

    def test_learns_the_label_better_than_chance(self, spark, sf_dir):
        # sanity that training MOVED: accuracy must beat the majority
        # class (the base rate of non-'en' docs), i.e. the model learned
        # signal from the hashed token distributions, not noise
        got = QUERIES["doc_quality_classifier"].fn(spark, sf_dir).collect()
        acc = sum(1 for r in got if r["pred"] == (r["label"] == 1.0)) / len(got)
        base = max(
            sum(1 for r in got if r["label"] == 1.0) / len(got),
            sum(1 for r in got if r["label"] == 0.0) / len(got),
        )
        assert acc >= base - 1e-9, f"accuracy {acc:.3f} below base rate {base:.3f}"


class TestPlanShape:
    def test_gradient_job_is_partial_agg_with_no_hash_shuffle(self, spark, sf_dir):
        # the per-iteration cost contract: 17 map-side-combined sums,
        # single-partition final merge — a hash exchange here would mean
        # the gradient shuffles the feature table every round
        import contextlib
        import io

        from pyspark.sql import functions as F

        from tlmc_etl_spark.operators.classifier import (
            N_BUCKETS,
            hashed_ngram_features,
        )
        from tlmc_etl_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        feats = hashed_ngram_features(
            docs, "doc_id", "text",
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0),
        ).localCheckpoint(eager=True)
        grad = feats.agg(
            *[F.sum(F.col("x")[j]).alias(f"g{j}") for j in range(N_BUCKETS + 1)]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            grad.explain("formatted")
        plan = buf.getvalue()
        assert "hashpartitioning" not in plan, plan
        assert plan.count("Arguments: SinglePartition") == 1, plan
        assert "partial_sum" in plan  # map-side combine before the merge

    def test_featurization_is_map_only(self, spark, sf_dir):
        # the 100 TB contract of the round-13 rewrite: the feature table
        # is ONE narrow stage — tokens never shuffle; an exchange here
        # means featurization regressed to the explode+regather form
        import contextlib
        import io

        from pyspark.sql import functions as F

        from tlmc_etl_spark.operators.classifier import hashed_ngram_features
        from tlmc_etl_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        feats = hashed_ngram_features(
            docs, "doc_id", "text",
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            feats.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan

    def test_scoring_plan_is_map_only_over_the_checkpoint(self, spark, sf_dir):
        import contextlib
        import io

        from pyspark.sql import functions as F

        from tlmc_etl_spark.operators.classifier import (
            N_BUCKETS,
            hashed_ngram_features,
            score_logreg,
        )
        from tlmc_etl_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        feats = hashed_ngram_features(
            docs, "doc_id", "text",
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0),
        ).localCheckpoint(eager=True)
        scored = score_logreg(feats, [0.1] * (N_BUCKETS + 1))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            scored.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan


class TestContracts:
    def test_tokenless_doc_scores_through_intercept(self, spark):
        from pyspark.sql import functions as F

        from tlmc_etl_spark.operators.classifier import (
            hashed_ngram_features,
            score_logreg,
            train_logreg,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma", "en"), (2, "", "de"), (3, "!!! ???", "fr")],
            "doc_id long, text string, lang string",
        )
        feats = hashed_ngram_features(
            docs, "doc_id", "text",
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0),
        )
        rows = {r["_id"]: r for r in feats.collect()}
        assert len(rows) == 3
        # token-less docs carry the intercept-only vector
        assert rows[2]["x"][:16] == [0.0] * 16 and rows[2]["x"][16] == 1.0
        assert rows[3]["x"][:16] == [0.0] * 16 and rows[3]["x"][16] == 1.0
        assert abs(sum(rows[1]["x"][:16]) - 1.0) < 1e-12  # rel freqs sum to 1
        w = train_logreg(feats, dim=17, n_iterations=2)
        assert len(w) == 17
        out = {r["_id"]: r for r in score_logreg(feats, w).collect()}
        assert set(out) == {1, 2, 3}
        assert all(0.0 <= r["score"] <= 1.0 for r in out.values())
