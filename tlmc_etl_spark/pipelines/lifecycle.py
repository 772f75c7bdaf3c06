"""The composed §3.1→§3.2 lifecycle as ONE DAG: manifest → catalog →
similarity → shard sink → hydrated stats.

The reference runs its metadata lifecycle (info_scanner phases →
release catalog) and its similarity lifecycle (pooled recall → chamfer
rerank → 10k-anchor CSV shards → DB load) as one pipeline per release
cycle; benching the stages individually can't see cross-stage plan
regressions (a broadcast held across a stage boundary, a subtree
silently recomputed, a sink that re-derives its input). This module
wires them together the way the reference does:

  1. catalog gate: only releases with NO review flags feed similarity —
     flagged albums are for humans, not the recommender
     (STEPS.md's review loop before precompute_similar_tracks.py).
  2. two-stage similarity over the gated track set.
  3. CSV shard sink (the SimilarTrackProcessor.cs load contract),
     materialized exactly once at the stage boundary.
  4. the returned stats DataFrame reads BACK from the sink — its
     lineage holds only the CSV scan + a broadcast catalog join, never
     the similarity subtree (plan-gated in tests/test_plan_quality.py),
     so downstream consumers can't accidentally recompute the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.pipelines.similarity import two_stage_similar_tracks
from tlmc_etl_spark.tuning import bounded_one_partition, dimension_exec
from tlmc_etl_spark.sinks.shards import (
    read_similar_track_shards,
    write_similar_track_shards,
)


def lifecycle_pre_sink(
    spark: SparkSession,
    release: DataFrame,
    chunks: DataFrame,
    track_col: str = "track",
    vec_col: str = "vec",
    k_recall: int = 15,
    k_final: int = 5,
    catalog_rows_hint: int | None = None,
):
    """Stages 1-2 (catalog gate → similarity): returns (rel, ranked,
    n_rel) WITHOUT writing the sink — `ranked` is the complete pre-sink
    plan, exposed so the shuffle-budget gate can inspect this half of
    the lifecycle on its own (the mid-DAG sink materialization otherwise
    defeats a static exchange count over the composed query)."""
    def _mk_rel() -> DataFrame:
        return (
            release.select(
                F.col("album_name"),
                # 24-row dimension: the global sort is a broadcast-sized
                # no-op; at real scale the release key would ride the track
                # table instead. bounded_one_partition: real (one-group)
                # partitionSpec so the fixed-dimension rank stops tripping
                # WindowExec's warning.
                F.row_number()
                .over(
                    W.partitionBy(
                        bounded_one_partition(F.length("circle_dir"))
                    ).orderBy("circle_dir", "album_dir")
                )
                .alias("rn"),
                (F.col("needs_review_reasons") == "").alias("clean"),
            )
            .withColumn("release_idx", F.col("rn") - 1)
            # Two consumers on opposite sides of the sink boundary (the
            # clean gate before similarity, hydration after read-back):
            # persist so the whole catalog subtree — manifest scans, vote
            # joins — runs once, not once per consumer. LRU-evictable,
            # repo-standard for tiny multi-scan reuse tables.
            .persist()
        )

    # The catalog materialization is a DIMENSION subtree (manifest rows
    # in, |releases| rows out): planned normally it pays ~14 sequential
    # one-task jobs — mostly BroadcastExchange builds, one per dimension
    # join, plus AQE stage materializations (the round-15 "AQE
    # dimension-floor"). With a caller-supplied row estimate — the
    # manifest's parquet footer count, no job — the whole subtree
    # compiles (persist() freezes the physical plan at call time, so the
    # context must wrap it) and runs as ONE statically planned job with
    # size-derived partitions (measured 15 jobs -> 1 job / 16 chained
    # one-task stages), and the persisted catalog caches in that compact
    # layout. Without a hint, behavior is unchanged.
    if catalog_rows_hint is not None:
        with dimension_exec(spark, catalog_rows_hint):
            rel = _mk_rel()
            n_rel = rel.count()
    else:
        rel = _mk_rel()
        n_rel = rel.count()
    clean_idx = rel.filter("clean").select("release_idx")
    gated = chunks.join(
        F.broadcast(clean_idx),
        F.pmod(F.col(track_col), F.lit(n_rel)) == F.col("release_idx"),
        "left_semi",
    )
    ranked = two_stage_similar_tracks(
        gated, track_col, vec_col, k_recall=k_recall, k_final=k_final,
        chunk_order_col="vec_id",
    )
    return rel, ranked, n_rel


def lifecycle_post_sink(
    spark: SparkSession, out_dir: str, rel: DataFrame, n_rel: int
) -> DataFrame:
    """Stage 4 (read-back + hydrated per-shard stats): lineage holds only
    the CSV scan + a broadcast catalog join — never the similarity
    subtree (plan-gated). Split out so this half gets its own shuffle
    budget too."""
    back = read_similar_track_shards(spark, out_dir)
    hydrated = back.join(
        F.broadcast(rel.select("release_idx", "album_name")),
        F.pmod(F.col("anchor_id").cast("long"), F.lit(n_rel)) == F.col("release_idx"),
        "left",
    )
    return (
        hydrated.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("anchor_id").alias("n_anchors"),
            F.countDistinct("album_name").alias("n_albums"),
        )
        .orderBy("shard")
    )


def similar_track_lifecycle(
    spark: SparkSession,
    release: DataFrame,
    chunks: DataFrame,
    out_dir: str,
    track_col: str = "track",
    vec_col: str = "vec",
    k_recall: int = 15,
    k_final: int = 5,
    n_shards: int = 8,
    portable_shards: bool = False,
    catalog_rows_hint: int | None = None,
) -> DataFrame:
    """Run catalog-gate → similarity → shard sink; return per-shard stats.

    `release` is the gold catalog (must carry circle_dir/album_dir/
    album_name/needs_review_reasons); `chunks` the (track, order, vec)
    chunk table. Tracks map to releases by track mod |catalog| — the
    synthetic keying the test tables use throughout.
    """
    rel, ranked, n_rel = lifecycle_pre_sink(
        spark, release, chunks, track_col, vec_col, k_recall, k_final,
        catalog_rows_hint=catalog_rows_hint,
    )
    write_similar_track_shards(
        ranked, out_dir, n_shards=n_shards, portable=portable_shards
    )
    return lifecycle_post_sink(spark, out_dir, rel, n_rel)
