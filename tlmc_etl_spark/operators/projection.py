"""Distributed PCA projection — the serving map's layout half.

The reference pools per-track embeddings and runs umap.UMAP(n_components=3,
metric="cosine") on the driver, then joins metadata and writes the CSV the
scatter app reads (Experimental/vector_search/umap-preprocessor.py:40-57,
Experimental/webdemo/app.py:114-308). UMAP itself is an iterative
stochastic fit — a model artifact, not a dataflow — so the engine's
counterpart is the deterministic projection that fills the same serving
contract at any corpus size: distributed PCA.

Spark-first shape (no library, no driver-side data pass):
 1. one `mapInPandas` pass emits per-Arrow-batch PARTIALS — count,
    sum-vector, and flattened Gram matrix X^T X (d=64 -> 4 KB per batch);
 2. the partials fold to one global (n, S, G) via posexplode -> groupBy
    position -> sum: a single shuffle whose width is batches x (d^2+d+1)
    rows, independent of corpus size;
 3. the driver eigendecomposes the d x d covariance (trivial at d=64) and
    fixes each component's sign (largest-|coefficient| positive) so the
    output is deterministic — numpy's eigh sign is otherwise arbitrary;
 4. the projection itself is pure whole-stage-codegen JVM: per component a
    zip_with/aggregate dot product against a literal coefficient array,
    minus the constant mean offset. No UDF in the per-row hot path.

At 100 TB: step 1 is map-only; step 2 shuffles ~(n_batches x 4161) tiny
rows; step 3 collects d^2+d+1 = 4,161 doubles regardless of n; step 4 is
map-only. Nothing scales with corpus size except the embarrassingly
parallel passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_basis(
    emb: DataFrame, vec_col: str, k: int = 3
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit the PCA basis distributedly: returns (mean[d], components[k,d],
    explained_variance[k]), components sign-fixed for determinism."""
    import pandas as pd

    first = emb.select(vec_col).first()
    d = len(first[0])

    def partials(batches):
        for pdf in batches:
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            payload = np.concatenate(
                ([float(len(M))], M.sum(axis=0), (M.T @ M).ravel())
            )
            yield pd.DataFrame({"payload": [payload.tolist()]})

    folded = (
        emb.select(vec_col)
        .mapInPandas(partials, schema="payload array<double>")
        .select(F.posexplode("payload").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(1 + d + d * d)
    for r in folded:
        flat[r["pos"]] = r["v"]
    n, S, G = flat[0], flat[1 : 1 + d], flat[1 + d :].reshape(d, d)
    mean = S / n
    cov = G / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:k]
    comps = eigvec[:, order].T.copy()
    for j in range(comps.shape[0]):  # deterministic sign: dominant coef > 0
        if comps[j, np.argmax(np.abs(comps[j]))] < 0:
            comps[j] = -comps[j]
    return mean, comps, eigval[order]


class FrozenLinearReducer:
    """Minimal fitted-reducer stand-in with umap-learn's predict-only
    interface (`.transform(X: (n, d)) -> (n, k)`): a frozen seeded random
    linear map. Used by tests/test_projection.py to prove a real fitted
    reducer (umap.UMAP, not in this container) drops into
    reducer_project and the layout-blind density plan with zero plan
    changes; lives here (not in the test module) so the broadcast
    unpickles on executors."""

    def __init__(self, d: int, k: int, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.W = rng.standard_normal((d, k))

    def transform(self, X):
        return X @ self.W


def reducer_project(
    emb: DataFrame, id_col: str, vec_col: str, reducer,
    out_cols: tuple[str, ...] = ("x", "y", "z"),
) -> DataFrame:
    """The UMAP predict-only plug point, exercised: project with ANY
    fitted reducer exposing umap-learn's serving interface
    (`reducer.transform(X: (n, d)) -> (n, k)`), as an Arrow-batched
    pandas UDF. This is the documented swap for a deployment that wants
    true UMAP instead of the deterministic PCA substitution: fit the
    reducer offline (a model artifact), broadcast it, and serve through
    THIS map-only pass — the surrounding plan (pooling, metadata join,
    scatter_density_serving's grid) is untouched, which
    tests/test_projection.py proves by driving the density plan with a
    frozen stub reducer. The reducer must be picklable (umap-learn
    reducers are); one `.transform` call per Arrow batch.

    Reference: umap-preprocessor.py:40-57 fits UMAP driver-side over
    ALL pooled tensors; this path keeps the fit offline and distributes
    the predict, which is what survives a 100 TB corpus."""
    from pyspark.sql.functions import pandas_udf

    bc = emb.sparkSession.sparkContext.broadcast(reducer)

    @pandas_udf("array<double>")
    def transform(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        Y = np.asarray(bc.value.transform(X), dtype=np.float64)
        return pd.Series([row.tolist() for row in Y])

    proj = emb.withColumn("__y", transform(F.col(vec_col).cast("array<double>")))
    for j, c in enumerate(out_cols):
        proj = proj.withColumn(c, F.element_at("__y", j + 1))
    return proj.drop("__y")


def pca_project(
    emb: DataFrame, id_col: str, vec_col: str, k: int = 3,
    out_cols: tuple[str, ...] = ("x", "y", "z"),
) -> DataFrame:
    """Project each vector onto the top-k principal axes, JVM-side."""
    mean, comps, _ = pca_basis(emb, vec_col, k)
    proj = emb
    for j in range(k):
        w = F.array(*[F.lit(float(c)) for c in comps[j]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), w, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj = proj.withColumn(out_cols[j], dot - float(np.dot(mean, comps[j])))
    return proj
