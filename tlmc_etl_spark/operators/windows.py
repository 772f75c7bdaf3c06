"""Reusable window/renumbering operators (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def gap_fill_numbers(
    df: DataFrame,
    group_cols: list[str],
    number_col: str,
    valid_col: str,
    order_cols: list[str],
    out_col: str = "assigned_number",
) -> DataFrame:
    """Gap-fill numbering: rows with `valid_col`=true keep `number_col`;
    the rest receive the smallest unclaimed positive numbers in
    `order_cols` order — collision-proof by construction
    (info_scanner_ph3.py:42-84).

    Fully distributed: the candidate pool per group is
    sequence(1, max_valid+n_total) (guaranteed to contain enough free
    slots), free slots found via anti-join, k-th invalid row ↔ k-th free
    slot via row_number. No UDF, no collect.
    """
    g = [F.col(c) for c in group_cols]
    base = df
    valid = base.filter(F.col(valid_col)).withColumn(out_col, F.col(number_col))
    w_need = W.partitionBy(*g).orderBy(*[F.col(c) for c in order_cols])
    invalid_ranked = (
        base.filter(~F.col(valid_col)).withColumn("__need_rank", F.row_number().over(w_need))
    )
    bounds = base.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n_total"),
        F.max(F.when(F.col(valid_col), F.col(number_col)).otherwise(0)).alias("__max_valid"),
    )
    pool = bounds.select(
        *g, F.explode(F.sequence(F.lit(1), F.col("__max_valid") + F.col("__n_total"))).alias("__cand")
    )
    taken = valid.select(*g, F.col(out_col).alias("__cand"))
    free = pool.join(taken, group_cols + ["__cand"], "left_anti").withColumn(
        "__need_rank", F.row_number().over(W.partitionBy(*g).orderBy("__cand"))
    )
    filled = (
        invalid_ranked.join(free, group_cols + ["__need_rank"])
        .withColumn(out_col, F.col("__cand"))
        .drop("__need_rank", "__cand")
    )
    return valid.unionByName(filled)


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int, rank_col: str = "rank"
) -> DataFrame:
    """Per-group top-k with 1-based rank (precompute_similar_tracks.py:259-269)."""
    w = W.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
