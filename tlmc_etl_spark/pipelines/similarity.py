"""Two-stage similarity pipeline: pooled recall → chamfer rerank → ranked
neighbor table (→ similar_track shards).

This is the reference's similarity lifecycle (SURVEY.md §3.2,
SIMILARITY-PLAN.md): brute-force late interaction over the full catalog is
~190 PFLOP ≈ 3 weeks, so a cheap exact-cosine recall stage prunes to K
candidates per anchor and the expensive chamfer score runs only on those —
a broadcast-then-refine join plan.

Spark shapes:
 - pooling: posexplode → groupBy(track, position) mean → renormalize.
   Reducer state is one running sum per (track, position) — never a
   gathered matrix.
 - recall: self-selecting (recall_candidates). Under EXACT_TILE_CEILING
   driver tiles the pooled matrix is collected tile-by-tile and shipped
   to tasks (at reference scale 164k×1024 fp32 ≈ 640 MB — broadcastable),
   candidates streaming through mapInPandas, one matmul per Arrow batch;
   past the ceiling the IVF candidate path takes over (bounded per-anchor
   work, recall floor property-gated).
 - rerank: chunk sets gathered per track with a hard cap (the reference
   pads/subsamples at 96 chunks, precompute_similar_tracks.py:84-92 — the
   cap IS the scale contract), pairs scored in applyInPandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.vectors import chamfer_numpy
from tlmc_etl_spark.tuning import fanout


def pooled_unit_mean(chunks: DataFrame, track_col: str, vec_col: str) -> DataFrame:
    """Per-track mean of chunk vectors, renormalized to unit length
    (utils/utils.py:114-129). Output: (track, pooled array<double>)."""
    expanded = chunks.select(
        F.col(track_col).alias("track"), F.posexplode(vec_col).alias("pos", "x")
    ).select("track", "pos", F.col("x").cast("double").alias("x"))
    mean_vec = expanded.groupBy("track", "pos").agg(F.avg("x").alias("m"))
    gathered = (
        mean_vec.groupBy("track")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("track", F.expr("transform(pm, s -> s.m)").alias("pooled"))
    )
    return gathered.select("track", _normalized("pooled").alias("pooled"))


def _normalized(col: str):
    norm = F.sqrt(F.aggregate(F.col(col), F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(F.col(col), lambda x: x / norm)


def cosine_recall(
    pooled: DataFrame, k: int, tile_rows: int = 200_000, n_known: int | None = None
) -> DataFrame:
    """Exact cosine top-k over the pooled table (tiled matmul; pooled
    vectors are unit-norm so cosine = dot). Output (anchor, neighbor,
    recall_score).

    Scale shape: the CANDIDATE side is processed in hash tiles of at most
    `tile_rows` rows — each tile is collected, broadcast, and scored
    against the streaming anchor side for a per-tile top-k; a final
    per-anchor window merges the partials. The driver never holds more
    than one tile, so memory is bounded by `tile_rows × dim`, not corpus
    size (the round-1 single-collect form broke at the reference's 640 MB
    pooled table). Tie-breaks are (rounded score desc, neighbor asc) both
    in-tile and in the merge window, so output is layout-independent.
    """
    import math

    n = pooled.count() if n_known is None else n_known
    n_tiles = max(1, math.ceil(n / tile_rows))
    spark = pooled.sparkSession

    partials = []
    for t in range(n_tiles):
        tile = (
            pooled.filter(F.pmod(F.xxhash64("track"), F.lit(n_tiles)) == t)
            if n_tiles > 1
            else pooled
        )
        rows = tile.collect()
        if not rows:
            continue
        ids = np.array([r["track"] for r in rows], dtype=np.int64)
        M = np.array([r["pooled"] for r in rows], dtype=np.float64)
        bc = spark.sparkContext.broadcast((ids, M))

        def score(batches, _bc=bc):
            c_ids, C = _bc.value
            for pdf in batches:
                A = np.array(pdf["pooled"].tolist(), dtype=np.float64)
                a_ids = pdf["track"].to_numpy()
                sims = np.round(A @ C.T, 6)
                for i in range(len(a_ids)):
                    row = sims[i]
                    mask = c_ids != a_ids[i]
                    cand_ids = c_ids[mask]
                    cand_s = row[mask]
                    order = np.lexsort((cand_ids, -cand_s))[:k]
                    yield pd.DataFrame(
                        {
                            "anchor": np.full(len(order), a_ids[i]),
                            "neighbor": cand_ids[order],
                            "recall_score": cand_s[order],
                        }
                    )

        partials.append(
            (
                bc,
                pooled.mapInPandas(
                    score, schema="anchor long, neighbor long, recall_score double"
                ),
            )
        )

    from functools import reduce

    if not partials:
        return spark.createDataFrame([], "anchor long, neighbor long, recall_score double")
    union = reduce(DataFrame.unionByName, [p for _, p in partials])
    w = W.partitionBy("anchor").orderBy(F.col("recall_score").desc(), F.col("neighbor").asc())
    merged = (
        union.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    # ONE materialization of the merged top-k (n_anchors × k rows — small)
    # releases every tile broadcast at once; a per-tile eager checkpoint
    # would instead run one extra job per tile (measured 2x on the
    # two-stage pipeline), while skipping the release entirely would pin
    # every tile's (ids, matrix) copy on driver and disk for the session.
    merged = merged.localCheckpoint(eager=True)
    for bc_t, _ in partials:
        bc_t.destroy()
    return merged


# Ceiling on driver tile collects the exact recall path may pay. Each
# tile is one collect + one broadcast + one full-corpus matmul pass, so
# exact cost grows as n_tiles × n — quadratic once tiles grow with the
# corpus. Past the ceiling the IVF candidate path takes over (the
# reference's own two-tier design: exact late-interaction only inside a
# recalled candidate set, SIMILARITY-PLAN.md:63-79).
EXACT_TILE_CEILING = 8


def choose_recall_strategy(
    n: int, tile_rows: int = 200_000, exact_tile_ceiling: int = EXACT_TILE_CEILING
) -> str:
    """'exact' while the corpus fits in <= exact_tile_ceiling broadcast
    tiles, else 'ivf'. Pure so the takeover point is contract-testable
    at any n without materializing a corpus that size."""
    import math

    return (
        "exact"
        if max(1, math.ceil(n / tile_rows)) <= exact_tile_ceiling
        else "ivf"
    )


def recall_candidates(
    pooled: DataFrame,
    k: int,
    tile_rows: int = 200_000,
    exact_tile_ceiling: int = EXACT_TILE_CEILING,
    target_cell: int = 4096,
    n_probe: int = 8,
    seed: int = 42,
    n_known: int | None = None,
) -> DataFrame:
    """Self-selecting recall stage: exact tiled cosine while the corpus
    is small enough that every candidate tile fits through a bounded
    number of driver collects; IVF candidate generation beyond.

    The IVF arm auto-sizes the coarse quantizer to the corpus —
    n_centroids = ceil(n / target_cell) keeps EXPECTED cell occupancy
    ~target_cell regardless of n, so per-anchor candidate work is
    n_probe × target_cell — bounded, not corpus-proportional. Recall
    against the exact form is property-gated
    (tests/test_similarity_pipeline.py); scores of emitted candidates
    are exact cosine in both arms, so the rerank stage sees identical
    semantics either way.
    """
    import math

    n = pooled.count() if n_known is None else n_known
    if choose_recall_strategy(n, tile_rows, exact_tile_ceiling) == "exact":
        return cosine_recall(pooled, k, tile_rows, n_known=n)
    from tlmc_etl_spark.operators.vectors import ivf_topk

    n_centroids = max(16, math.ceil(n / target_cell))
    return ivf_topk(
        pooled,
        "track",
        "pooled",
        k=k,
        n_centroids=n_centroids,
        n_probe=min(n_probe, n_centroids),
        seed=seed,
    ).select(
        "anchor",
        "neighbor",
        F.round(F.col("score"), 6).alias("recall_score"),
    )


def gather_chunks(
    chunks: DataFrame,
    track_col: str,
    vec_col: str,
    cap: int = 96,
    order_col: str | None = None,
) -> DataFrame:
    """(track, chunk matrix as array<array<double>>), capped at `cap`
    chunks per track — the pad/subsample contract.

    Which chunks survive the cap is decided by `order_col` (an explicit,
    stable per-chunk index — pass the source row id / chunk ordinal).
    Without one, the fallback orders by xxhash64 of the vector content —
    still layout-independent, unlike a monotonically_increasing_id, which
    depends on partition layout and made rerank scores drift across
    repartitions (the engine's determinism rule forbids that)."""
    order = F.col(order_col) if order_col else F.xxhash64(F.col(vec_col))
    w = W.partitionBy(track_col).orderBy(order)
    capped = (
        chunks.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
    # No cast to array<double> here: the chunk matrix is the similarity
    # pipeline's heaviest payload, and float->double widening is EXACT, so
    # the scorers' np.asarray(..., dtype=np.float64) produces bit-identical
    # matrices from the float32 columns while the gather shuffle, the pair
    # rows and the Arrow transfer all ship HALF the bytes (the
    # _with_unit_norm idiom, operators/vectors.py). An already-double
    # input stays double — same values either way.
    return capped.groupBy(F.col(track_col).alias("track")).agg(
        F.collect_list(F.col(vec_col)).alias("chunk_set")
    )


def chamfer_rerank(recall: DataFrame, chunk_sets: DataFrame, k_final: int) -> DataFrame:
    """Score recall pairs with symmetric chamfer over chunk sets, keep the
    per-anchor top k_final with dense 1-based ranks.

    Data movement (the §8 rule: shuffles should move lightweight proxies,
    payloads once): only the NEIGHBOR-side chunk matrix is attached to
    pair rows; the anchor-side matrix meets its pairs through a cogroup
    on `anchor`, so each anchor's cap×dim matrix crosses the shuffle and
    the Arrow boundary once per ANCHOR instead of once per pair — a
    k_recall× cut of the anchor half of the payload. (The previous shape
    joined BOTH matrices onto every pair and round-robined the doubled
    payload to the scorer; the plan showed pair rows carrying `ca` and
    `cb` through two joins plus the fanout exchange.) Per-pair arithmetic
    is unchanged, so scores are bit-identical.
    """
    b_side = chunk_sets.select(F.col("track").alias("neighbor"), F.col("chunk_set").alias("cb"))
    a_side = chunk_sets.select(F.col("track").alias("anchor"), F.col("chunk_set").alias("ca"))
    # fanout pins the scorer's parallelism (AQE's byte-based coalescing
    # would fold the small-in-bytes pair table into too few tasks for
    # CPU-heavy work); keyed on anchor so the cogroup below reuses this
    # exchange instead of adding one.
    pairs = fanout(recall.join(b_side, "neighbor"), "anchor")

    def score_group(pairs_pdf, a_pdf):
        # inner-join semantics on both sides, matching the previous joins:
        # a pair whose anchor has no chunk set drops; an anchor with no
        # pairs emits nothing.
        if len(pairs_pdf) == 0 or len(a_pdf) == 0:
            return pd.DataFrame({"anchor": pd.Series(dtype="int64"),
                                 "neighbor": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        # unique-track contract: chunk_sets is a per-track aggregate, so
        # each cogroup key carries exactly one anchor row — duplicates
        # would have been scored per-row by the pre-cogroup join form,
        # so fail loudly instead of silently scoring only the first.
        assert len(a_pdf) == 1, f"duplicate chunk_sets rows for anchor: {len(a_pdf)}"
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a_pdf["ca"].iloc[0]])
        out = [
            (a, n, round(chamfer_numpy(
                A,
                np.stack([np.asarray(v, dtype=np.float64) for v in cb]),
            ), 6))
            for a, n, cb in zip(
                pairs_pdf["anchor"], pairs_pdf["neighbor"], pairs_pdf["cb"]
            )
        ]
        return pd.DataFrame(out, columns=["anchor", "neighbor", "score"])

    scored = (
        pairs.groupBy("anchor")
        .cogroup(a_side.groupBy("anchor"))
        .applyInPandas(score_group, schema="anchor long, neighbor long, score double")
    )
    w = W.partitionBy("anchor").orderBy(F.col("score").desc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_final)
        .select("anchor", "neighbor", "rank", "score")
    )


def gather_weighted_chunks(
    chunks: DataFrame,
    weights: DataFrame,
    track_col: str,
    vec_col: str,
    id_col: str,
    cap: int = 96,
    order_col: str | None = None,
) -> DataFrame:
    """(track, chunk matrix, weight vector) with aligned ordering: the
    chunk-IDF weight table (id, weight) joins back onto the chunks by
    chunk id BEFORE the capped gather, and both arrays collect through
    one sorted struct so weight i always belongs to chunk i."""
    order = F.col(order_col) if order_col else F.xxhash64(F.col(vec_col))
    w = W.partitionBy(track_col).orderBy(order)
    joined = chunks.join(weights.select(F.col("id").alias(id_col), "weight"), id_col)
    capped = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
    )
    # vector stays in its source width through the gather/shuffle (see
    # gather_chunks — widening happens exactly in the float64 scorer)
    gathered = capped.groupBy(F.col(track_col).alias("track")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__rn").alias("o"),
                    F.col(vec_col).alias("v"),
                    F.col("weight").alias("w"),
                )
            )
        ).alias("ovw")
    )
    return gathered.select(
        "track",
        F.expr("transform(ovw, s -> s.v)").alias("chunk_set"),
        F.expr("transform(ovw, s -> s.w)").alias("chunk_weights"),
    )


def weighted_chamfer_rerank(
    recall: DataFrame, weighted_sets: DataFrame, k_final: int
) -> DataFrame:
    """Chamfer rerank with chunk-IDF weights on both sides — the
    reference's full rerank form (rerank.py:60-90 weighted q/d sides,
    weights from estimate_chunk_weights)."""
    from tlmc_etl_spark.operators.group_similarity import weighted_chamfer_numpy

    a_side = weighted_sets.select(
        F.col("track").alias("anchor"),
        F.col("chunk_set").alias("ca"),
        F.col("chunk_weights").alias("wa"),
    )
    b_side = weighted_sets.select(
        F.col("track").alias("neighbor"),
        F.col("chunk_set").alias("cb"),
        F.col("chunk_weights").alias("wb"),
    )
    # same cogroup shape as chamfer_rerank: the anchor-side (matrix,
    # weights) crosses the shuffle/Arrow boundary once per anchor, the
    # neighbor payload rides its pair row.
    pairs = fanout(recall.join(b_side, "neighbor"), "anchor")

    def score_group(pairs_pdf, a_pdf):
        if len(pairs_pdf) == 0 or len(a_pdf) == 0:
            return pd.DataFrame({"anchor": pd.Series(dtype="int64"),
                                 "neighbor": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        # unique-track contract (see chamfer_rerank.score_group)
        assert len(a_pdf) == 1, f"duplicate weighted_sets rows for anchor: {len(a_pdf)}"
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a_pdf["ca"].iloc[0]])
        wa = np.asarray(a_pdf["wa"].iloc[0])
        out = [
            (a, n, round(weighted_chamfer_numpy(
                A,
                np.stack([np.asarray(v, dtype=np.float64) for v in cb]),
                wa, np.asarray(wb),
            ), 6))
            for a, n, cb, wb in zip(
                pairs_pdf["anchor"], pairs_pdf["neighbor"],
                pairs_pdf["cb"], pairs_pdf["wb"],
            )
        ]
        return pd.DataFrame(out, columns=["anchor", "neighbor", "score"])

    scored = (
        pairs.groupBy("anchor")
        .cogroup(a_side.groupBy("anchor"))
        .applyInPandas(score_group, schema="anchor long, neighbor long, score double")
    )
    w = W.partitionBy("anchor").orderBy(F.col("score").desc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_final)
        .select("anchor", "neighbor", "rank", "score")
    )


def two_stage_similar_tracks(
    chunks: DataFrame,
    track_col: str,
    vec_col: str,
    k_recall: int = 20,
    k_final: int = 5,
    chunk_cap: int = 96,
    chunk_order_col: str | None = None,
) -> DataFrame:
    """recall→rerank composition; output feeds
    sinks/shards.write_similar_track_shards unchanged."""
    # The pooled table feeds cosine_recall several times: the count, each
    # candidate tile collect, and the distributed anchor input. Persist it
    # (n_tracks rows — tiny at any corpus scale) so the explode+aggregate
    # pooling subtree runs once.
    pooled = pooled_unit_mean(chunks, track_col, vec_col).persist()
    # Self-selecting: exact tiled cosine under the tile ceiling, IVF
    # candidates beyond it (recall floor property-gated).
    n = pooled.count()
    recall = recall_candidates(pooled, k_recall, n_known=n)
    # The recall stage consumes pooled eagerly in the exact arm (tile
    # collects, per-tile top-k partials localCheckpointed); the IVF arm
    # is lazy, so materialize before releasing the cache.
    if choose_recall_strategy(n) != "exact":
        recall = recall.localCheckpoint(eager=True)
    pooled.unpersist()
    sets = gather_chunks(chunks, track_col, vec_col, chunk_cap, order_col=chunk_order_col)
    return chamfer_rerank(recall, sets, k_final)
