"""Model-based document quality/domain classifier: distributed logistic
regression over hashed n-gram features.

Production corpora are filtered by TRAINED classifiers (the
CCNet/fastText pattern: weak labels from a trusted corpus, hashed
bag-of-n-grams features, a linear model scored over everything), not
only by rules. This is that shape, Spark-first:

 - featurization is MAP-ONLY: each document's bucket histogram folds
   inside one JVM `aggregate` over its own token array (hashed bucket =
   portable md5 hash of the token, so a DuckDB oracle can replay it
   bit-for-bit) — zero exchanges before the gradient job;
 - training is FIXED-ITERATION batch gradient descent: each iteration
   is ONE partial-aggregating job over the checkpointed feature table
   (d+1 sums merged map-side; the only exchange is the final
   single-partition merge of 32 partial rows) whose 1-row result
   updates the weight vector on the driver — the same bounded-driver
   contract as the PQ codebook trainer and the BPE loop (d+1 doubles
   per round, never rows);
 - scoring embeds the final weights as literals in a map-only plan.

Determinism: w0 = 0 (so iteration 1's sigmoid is exactly 0.5 in any
engine), fixed learning rate, fixed iteration count, relative-frequency
features — the whole trajectory is closed-form replayable in SQL, which
is exactly how the oracle checks it (plans/lm.py:doc_quality_classifier).

Reference: the measured-heuristic curation pattern (constants derived
from scanning the library, then applied to every row,
disc_scanner.py:40-53) upgraded to a trained model; SURVEY.md lists the
rule-based cascade this classifier complements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.dedup import portable_hash60

N_BUCKETS = 16
LEARNING_RATE = 1.0
N_ITERATIONS = 3


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, x: array<double> of dim n_buckets+1, y) — relative token
    frequency per hashed bucket plus a trailing intercept feature 1.0.

    MAP-ONLY: tokens never leave their row. Each document's bucket
    histogram folds inside one JVM `aggregate` over the token array
    (O(tokens × n_buckets) when-branches, whole-stage codegen), so
    featurization is a single narrow stage with ZERO exchanges — at
    100 TB the alternative (explode → per-(doc,bucket) count →
    re-gather per doc) shuffles the corpus twice for the same numbers.
    The round-13 original shipped that explode form; this rewrite is
    value-identical (integer-valued double counts, same division) and
    the oracle did not move.

    The bucket hash is the portable 60-bit md5 prefix ('ngq' salt), so
    an ANSI-SQL oracle reproduces the bucketing exactly. Documents with
    zero tokens keep the intercept-only vector, so every row is scored.
    """
    d = n_buckets
    staged = docs.select(
        F.col(id_col).alias("_id"),
        label_col.alias("y"),
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)").alias("_toks"),
    )
    buckets = F.transform(
        F.col("_toks"),
        lambda t: (portable_hash60(F.concat(F.lit("ngq"), t)) % d).cast("int"),
    )
    hist = F.aggregate(
        buckets,
        F.array_repeat(F.lit(0.0), d),
        lambda acc, b: F.transform(
            acc, lambda v, i: F.when(i == b, v + F.lit(1.0)).otherwise(v)
        ),
    )
    nt = F.size("_toks")
    xb = F.when(
        nt > 0, F.transform(hist, lambda v: v / nt)
    ).otherwise(F.array_repeat(F.lit(0.0), d))
    return staged.select(
        "_id", F.concat(xb, F.array(F.lit(1.0))).alias("x"), "y"
    )


def _margin(w: list[float]):
    wc = F.array(*[F.lit(float(v)) for v in w])
    return F.aggregate(
        F.zip_with("x", wc, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def train_logreg(
    feats: DataFrame,
    dim: int,
    lr: float = LEARNING_RATE,
    n_iterations: int = N_ITERATIONS,
) -> list[float]:
    """Fixed-iteration batch GD; returns the weight vector.

    Per iteration: grad_j = mean over rows of (sigmoid(w.x) - y) * x_j,
    computed as dim+1 partial-aggregating sums + one count in a single
    job — the driver holds one (dim+2)-double row per iteration.
    """
    w = [0.0] * dim
    n = None
    for _ in range(n_iterations):
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w))) - F.col("y")
        aggs = [F.sum(err * F.col("x")[j]).alias(f"g{j}") for j in range(dim)]
        if n is None:
            aggs.append(F.count(F.lit(1)).alias("_n"))
        row = feats.agg(*aggs).collect()[0]
        if n is None:
            n = float(row["_n"])
        w = [w[j] - lr * float(row[f"g{j}"]) / n for j in range(dim)]
    return w


def score_logreg(feats: DataFrame, w: list[float]) -> DataFrame:
    """Map-only scoring: (id, score, pred) with the weights as literals."""
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
    return feats.select(
        "_id", F.round(s, 6).alias("score"), (s >= 0.5).alias("pred"), "y"
    )
