"""Known reference defects the engine must NOT reproduce (SURVEY.md
§7.4-6, V6-MIGRATION-HANDOFF.md:217-287): pinned as executable gates so
a refactor can't silently re-introduce them.

G1 — tracks shorter than the chunk window were dropped entirely.
G2 — the trailing partial chunk was dropped.
V4 — chunk ordinals / offsets stepped inconsistently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tlmc_etl_spark.plans import QUERIES
from tlmc_etl_spark.sources.tables import load_table


def _chunks(spark, sf_dir):
    return QUERIES["doc_chunking"].fn(spark, sf_dir)


def test_g1_short_documents_are_not_dropped(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    short_ids = {r["doc_id"] for r in docs.filter("n < 64").collect()}
    chunk_ids = {r["doc_id"] for r in _chunks(spark, sf_dir).select("doc_id").distinct().collect()}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert chunk_ids == all_ids, "every document must chunk, none dropped"
    assert short_ids, "fixture must contain sub-window docs or G1 is untested"
    assert short_ids <= chunk_ids


def test_g2_trailing_words_are_covered(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    last = (
        _chunks(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.max("chunk_idx").alias("i_last"),
            F.max_by("n_words", "chunk_idx").alias("last_words"),
        )
    )
    # stride 48: the final chunk must end exactly at word n — a dropped
    # trailing chunk would leave i_last*48 + last_words < n
    bad = (
        last.join(docs, "doc_id")
        .filter(F.col("i_last") * 48 + F.col("last_words") != F.col("n"))
        .count()
    )
    assert bad == 0, "trailing chunk dropped or mis-sized"


def test_v4_chunk_ordinals_are_gapless(spark, sf_dir):
    agg = (
        _chunks(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("mx"),
            F.countDistinct("chunk_idx").alias("nd"),
        )
    )
    bad = agg.filter(
        (F.col("mx") != F.col("n_chunks") - 1) | (F.col("nd") != F.col("n_chunks"))
    ).count()
    assert bad == 0, "chunk ordinals must be dense 0..k-1 per document"
