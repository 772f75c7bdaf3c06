"""Ext query catalog: operators whose semantics a SQL oracle cannot
express (hash-function-dependent signatures, optimal assignment, late
interaction). The driver records rows-only checks for these; real
verification is the differential/property suites in tests/ — the same
strategy the reference uses for its GPU kernels (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.dedup import minhash_near_dupes, simhash_near_dupes
from tlmc_etl_spark.operators.fuzzy import hungarian_match_join
from tlmc_etl_spark.operators.vectors import chamfer_group_scores, lsh_topk
from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


@query("minhash_lsh_dedup")
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs over documents.

    Scale path for ngram_jaccard_pairs (which is its exact oracle at small
    J): 64 xxhash64 permutations, 32 bands × 2 rows, estimate ≥ 0.1.
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_dupes(
        docs, "doc_id", "text", n_hashes=64, n_bands=32, threshold=0.1
    ).orderBy("id_a", "id_b")


@query("simhash_dedup")
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 16 of 64 bits, chunk-banded)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dupes(docs, "doc_id", "text", max_hamming=16).orderBy("id_a", "id_b")


@query("chamfer_group_similarity")
def chamfer_group_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric chamfer (mean-of-max cosine) between label groups of
    embeddings — the late-interaction group score
    (rerank.py:47-116, precompute_similar_groups.py:195-235)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return chamfer_group_scores(emb, "label", "embedding").orderBy("group_a", "group_b")


@query("lsh_ann_topk")
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 cosine neighbors via sign-LSH buckets — the
    beyond-memory-budget fallback for cosine_topk
    (SIMILARITY-PLAN.md:52-55 inverted: ANN only when exact doesn't fit)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, "vec_id", "embedding", k=10, n_planes=4).orderBy("anchor", "rank")


@query("fuzzy_hungarian_match")
def fuzzy_hungarian_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally-optimal 1:1 fuzzy title match per group (Hungarian).

    Left = parts by size-group; right = the same titles perturbed
    (truncated + case-folded), so scores land below 100 and the 0.8
    acceptance threshold is exercised (song_info_matcher.py:123-208).
    """
    part = load_table(spark, sf_dir, "part")
    left = part.select(
        F.col("p_size").cast("long").alias("grp"),
        F.col("p_partkey").cast("string").alias("pid"),
        F.col("p_name").alias("title"),
    )
    right = part.select(
        F.col("p_size").cast("long").alias("grp"),
        F.concat(F.lit("w_"), F.col("p_partkey")).alias("pid"),
        F.upper(F.expr("substring(p_name, 1, length(p_name) - 2)")).alias("title"),
    )
    return hungarian_match_join(
        left, right, "grp", "pid", "title", "pid", "title", accept_fraction=0.8
    ).orderBy("grp", "left_id")
