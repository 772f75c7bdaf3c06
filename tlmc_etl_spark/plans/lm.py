"""Corpus-trained language-model statistics for training-data curation.

Two operators a 100 TB pretraining pipeline runs between dedup and
packing, both "train on the corpus, score every document with the
result" shapes — the whole model lives inside one Catalyst DAG, no
driver round-trip, no side-channel model file:

 - `bigram_lm_doc_score`: add-one-smoothed bigram LM trained on the
   full corpus; every document scored by its average bigram
   log-probability. The distribution's low tail is the classic
   gibberish/boilerplate filter (the measurable stand-in for the
   perplexity filters used by CCNet/KenLM-style curation).
 - `tfidf_top_terms`: per-document top-k salient terms by TF-IDF with a
   fully integer-deterministic rank (tf desc, df asc, term asc) so the
   result is reproducible bit-for-bit across engines — the float score
   is carried as a display column, never as the ranking key.

The reference's analogue is its measured-heuristic curation pattern —
classifier constants derived from scanning the whole library, then
applied to every row (disc_scanner.py:40-53, disc_duration_guard.py's
measured MIN_TRACKS/MIN_MINUTES); here the same train-on-corpus /
score-every-row step is expressed as declarative corpus aggregates
over the `documents` table.

Scale notes (both operators):
 - the "model" tables (bigram counts, document frequencies) are corpus
   aggregates orders of magnitude smaller than the corpus; they shuffle
   once on the same key the scoring join needs, so Catalyst reuses the
   exchange rather than re-partitioning;
 - scoring joins hit Zipfian keys ("the", frequent bigrams) — exactly
   the skew AQE's runtime skew-join split handles; nothing here pins a
   plan that would fight it;
 - the only scalars (vocabulary size, corpus doc count) travel as 1-row
   broadcast joins, never as collected literals;
 - at 100 TB you would additionally df-cap stopword-grade terms before
   the self-sized joins (the same DF_CAP_CEILING rationale as
   plans/text.py's pair generation); at registry scale the uncapped
   form IS the oracle-checkable baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


@query(
    "bigram_lm_doc_score",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bg AS (
  SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ws) - 1),
                                 i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
    FROM words WHERE len(ws) >= 2
  )
), model AS (
  SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY w1, w2
), ctx AS (
  SELECT w1, sum(c_bg) AS c_ctx FROM model GROUP BY w1
), vocab AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(ws) AS w FROM words)
)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(ln((c_bg + 1.0) / (c_ctx + v))), 4) AS avg_logp
FROM bg JOIN model USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
GROUP BY doc_id
ORDER BY doc_id
""",
)
def bigram_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one bigram LM; per-doc average log-probability.

    Train and score in one DAG: bigram occurrences feed the model
    aggregate AND the scoring join, so the explode is materialized once
    (eager localCheckpoint — see inline comment for why not persist);
    the model join key (w1, w2) is the model's own grouping key, so the
    aggregate's exchange is reused for the join. P(w2|w1) =
    (C(w1,w2)+1) / (C(w1)+V) with C(w1) folded from the bigram model
    itself (so context mass and bigram mass always agree) and V the
    distinct-token vocabulary riding a 1-row broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    # ws_all is the UNFILTERED token view: vocabulary V must count every
    # distinct token in the corpus, including tokens that only appear in
    # 0/1-token documents — the oracle's vocab CTE is unfiltered, and a
    # filtered V silently shifts every smoothing denominator (c_ctx + V)
    # on any corpus containing short documents.
    ws_all = docs.select("doc_id", F.split("text", " ").alias("ws"))
    ws = ws_all.filter(F.size("ws") >= 2)
    # localCheckpoint(eager) rather than persist: bg feeds four branches
    # (model, ctx, the scoring probe, and their joins) whose column
    # pruning diverges, so ReuseExchange can't dedupe them — the explode
    # must be materialized once. A persist would pin the blocks in
    # CacheManager until context shutdown (they accumulate across a
    # long-lived bench/parity session); localCheckpoint blocks are
    # ContextCleaner-managed and vanish when this DataFrame is GC'd.
    bg = (
        ws.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1,"
                    "             element_at(ws, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
        .localCheckpoint(eager=True)
    )
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = model.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = ws_all.select(F.explode("ws").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    logp = F.log((F.col("c_bg") + 1.0) / (F.col("c_ctx") + F.col("v")))
    return (
        bg.join(model, ["w1", "w2"])
        .join(ctx, "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


@query(
    "tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w
), df AS (
  SELECT w, count(*) AS df FROM tf GROUP BY w
), n AS (
  SELECT count(*) AS n_docs FROM documents
), ranked AS (
  SELECT doc_id, w AS term, tf, df,
         round(tf * ln((n_docs + 1.0) / (df + 1.0)), 4) AS tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, df ASC, w ASC) AS rnk
  FROM tf JOIN df USING (w) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, rnk
FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rnk
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document, TF-IDF weighted.

    Document frequency folds out of the per-doc term counts (df = how
    many (doc, term) rows carry the term), so the corpus is tokenized
    exactly once and the df aggregate reuses the tf shuffle's output.
    Ranking is integer-only (tf desc, df asc, term asc): float TF-IDF
    never decides order — engines disagree on ln() at the ulp level and
    a rank flip there would be an irreproducible result; the smoothed
    ln((N+1)/(df+1)) score is carried for display at 4 dp.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    # localCheckpoint(eager) rather than persist: tf feeds the df
    # aggregate and the scoring join with divergent pruned schemas, so
    # the tokenize+count must be materialized once — and checkpoint
    # blocks are ContextCleaner-managed (GC'd with this DataFrame)
    # where a persist would pin them in CacheManager for the session.
    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    win = W.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("w").asc()
    )
    return (
        tf.join(df, "w")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4
            ),
        )
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id", F.col("w").alias("term"), "tf", "df", "tfidf", "rnk"
        )
        .orderBy("doc_id", "rnk")
    )


_PMI_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), toks AS (
  SELECT unnest(ws) AS w FROM words
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w
), bgs AS (
  SELECT b['w1'] AS w1, b['w2'] AS w2 FROM (
    SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                 i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
    FROM words WHERE len(ws) >= 2
  )
), bg AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bgs GROUP BY w1, w2
), nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
   nb AS (SELECT CAST(sum(c2) AS DOUBLE) AS n FROM bg)
SELECT w1, w2, c2,
       round(ln((c2 / nb.n) / ((u1.c / nu.n) * (u2.c / nu.n))), 4) AS pmi
FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w
CROSS JOIN nu CROSS JOIN nb
WHERE c2 >= 10
ORDER BY CAST(c2 AS DOUBLE) / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) DESC, w1, w2
LIMIT 50
"""


@query("collocation_pmi_top", oracle=_PMI_ORACLE)
def collocation_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level collocation mining: top bigrams by pointwise mutual
    information, the phrase detector curation pipelines run to decide
    which multi-word units to keep intact through tokenization
    (word2vec's phrase pass; "new york" scores high, "of the" scores
    low). Completes the lm.py family: bigram_lm scores DOCUMENTS by the
    corpus model, this scores the MODEL's own pairs.

    Cross-engine determinism: the ranking key is the raw ratio
    c2/(ca*cb) — integer counts pushed through IEEE divisions that both
    engines round identically — never the ln()-based PMI, which engines
    compute with ulp-level differences that could flip a 4 dp rounding
    or, worse, the LIMIT cut. The logged PMI is a display column only.

    Scale shape: unigram and bigram counts are corpus aggregates
    (vocabulary-sized); the scoring joins hit bg on w1/w2 with uni
    broadcast when dimension-sized, and the final top-50 runs as
    TakeOrderedAndProject — no global sort materializes. The c2 >= 10
    support floor is what keeps the PMI estimator out of its
    rare-pair noise regime AND bounds the scored pair set.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.split("text", " ").alias("ws"))
    # Both scalar totals in ONE map-side pass over the token arrays:
    # n_uni = total tokens (== sum of uni counts), n_bg = total bigram
    # slots (== sum of c2 BEFORE the support floor). The previous form
    # derived n_uni by re-aggregating the uni subtree (a second
    # tokenize+explode pass over the corpus) and n_bg from a third
    # documents scan; this aggregate touches no exploded rows at all.
    totals = words.agg(
        F.sum(F.size("ws")).cast("double").alias("n_uni"),
        F.sum(
            F.when(F.size("ws") >= 2, F.size("ws") - 1).otherwise(0)
        ).cast("double").alias("n_bg"),
    )
    # uni feeds the scoring join twice (w1 side, w2 side); persist — the
    # repo's convention for vocabulary-bounded multi-consumer reuse
    # tables (minhash sigs) — guarantees the tokenize+aggregate corpus
    # pass runs once even if AQE stage reuse misses the twin exchange.
    # (An eager localCheckpoint here measured SLOWER at sf0.1: the extra
    # blocking materialization job costs more than the saved pass.)
    uni = (
        words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    bg = (
        words.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= 10)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    scored = (
        bg.join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(totals))
        .withColumn(
            "score",
            F.col("c2").cast("double")
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double")),
        )
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("c2") / F.col("n_bg"))
                    / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
                ),
                4,
            ),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "w1", "w2")
        .limit(50)
        .select("w1", "w2", "c2", "pmi")
    )


_LOGREG_ORACLE = """
WITH docs AS (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, text
  FROM documents
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM docs
), tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM docs
), feat0 AS (
  SELECT doc_id,
         ('0x' || substr(md5('ngq' || t), 1, 15))::BIGINT % 16 AS j,
         CAST(count(*) AS DOUBLE) AS c
  FROM tok GROUP BY doc_id, 2
), ntok AS (
  SELECT doc_id, sum(c) AS nt FROM feat0 GROUP BY doc_id
), feat AS (
  SELECT doc_id, j, c / nt AS x FROM feat0 JOIN ntok USING (doc_id)
  UNION ALL
  SELECT doc_id, 16 AS j, 1.0 AS x FROM docs
), fy AS (
  SELECT f.doc_id, f.j, f.x, d.y FROM feat f JOIN docs d USING (doc_id)
), g1 AS (  -- iteration 1: w = 0 so sigmoid(margin) is exactly 0.5
  SELECT j, sum((0.5 - y) * x) / (SELECT n FROM nn) AS g FROM fy GROUP BY j
), w1 AS (
  SELECT j, -1.0 * g AS w FROM g1
), m1 AS (
  SELECT doc_id, sum(x * w) AS m FROM feat JOIN w1 USING (j) GROUP BY doc_id
), g2 AS (
  SELECT fy.j, sum((1.0 / (1.0 + exp(-m1.m)) - fy.y) * fy.x)
               / (SELECT n FROM nn) AS g
  FROM fy JOIN m1 USING (doc_id) GROUP BY fy.j
), w2 AS (
  SELECT w1.j, w1.w - 1.0 * g2.g AS w FROM w1 JOIN g2 ON w1.j = g2.j
), m2 AS (
  SELECT doc_id, sum(x * w) AS m FROM feat JOIN w2 USING (j) GROUP BY doc_id
), g3 AS (
  SELECT fy.j, sum((1.0 / (1.0 + exp(-m2.m)) - fy.y) * fy.x)
               / (SELECT n FROM nn) AS g
  FROM fy JOIN m2 USING (doc_id) GROUP BY fy.j
), w3 AS (
  SELECT w2.j, w2.w - 1.0 * g3.g AS w FROM w2 JOIN g3 ON w2.j = g3.j
), m3 AS (
  SELECT doc_id, sum(x * w) AS m FROM feat JOIN w3 USING (j) GROUP BY doc_id
)
SELECT d.doc_id, d.lang, d.y AS label,
       round(1.0 / (1.0 + exp(-m3.m)), 6) AS score,
       (1.0 / (1.0 + exp(-m3.m)) >= 0.5) AS pred
FROM docs d JOIN m3 ON d.doc_id = m3.doc_id
ORDER BY d.doc_id
"""


@query("doc_quality_classifier", oracle=_LOGREG_ORACLE)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED quality/domain classifier (CCNet/fastText pattern):
    logistic regression over hashed token-frequency features, weak
    labels from a trusted property (here lang='en'), scored over every
    document.

    Train and score in one deterministic trajectory: w0 = 0, fixed
    learning rate 1.0, exactly 3 batch-GD iterations. Each iteration is
    ONE partial-aggregating job over the checkpointed feature table
    (17 sums merged map-side, single-partition final merge — no hash
    shuffle); the driver holds one 18-double row per round, the same
    bounded-driver contract as the BPE argmax and the PQ codebooks. The
    oracle replays the identical trajectory closed-form in SQL (the
    bigram-LM train+score pattern extended to an iterative model).
    100 TB shape: featurization is explode + two keyed aggregates,
    training cost is n_iterations linear scans, scoring is map-only
    with the weights as literals.
    """
    from tlmc_etl_spark.operators.classifier import (
        N_BUCKETS,
        hashed_ngram_features,
        score_logreg,
        train_logreg,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_ngram_features(
        docs,
        "doc_id",
        "text",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0),
        n_buckets=N_BUCKETS,
    ).localCheckpoint(eager=True)
    w = train_logreg(feats, dim=N_BUCKETS + 1)
    scored = score_logreg(feats, w)
    lang = docs.select(F.col("doc_id").alias("_id"), "lang")
    return (
        scored.join(lang, "_id")
        .select(
            F.col("_id").alias("doc_id"),
            "lang",
            F.col("y").alias("label"),
            "score",
            "pred",
        )
        .orderBy("doc_id")
    )
