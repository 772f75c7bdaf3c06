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

    ONE shuffle, ONE reference to the input: rows collect per group and
    the whole gap-fill runs inside JVM higher-order array expressions —
    `sequence` builds the candidate pool bounded by max_valid+n_total,
    `array_except` (order-preserving) yields free slots ascending,
    `array_sort` with a null-first comparator orders the needy rows, and
    an indexed `transform` zips k-th needy row with k-th free slot (the
    shape the registered gap_fill_numbering query already carries). The
    previous form referenced `df` FOUR times (valid/invalid/bounds/taken)
    through unions and two join-backs; composed pipelines that nest this
    operator (build_catalog calls it twice, once on the other's output)
    squared that fan-out — the round-15 plan audit measured the catalog
    release plan at 120 Exchange nodes / 54 manifest scans from exactly
    this. Groups are disc-sized (tens of rows) at any corpus scale, so
    per-group arrays are bounded by domain.
    """
    data_cols = [c for c in df.columns if c not in group_cols]
    g = [F.col(c) for c in group_cols]
    number_type = df.schema[number_col].dataType
    base = df.select(
        *g, F.struct(*[F.col(c) for c in data_cols]).alias("__row")
    )
    grouped = base.groupBy(*g).agg(F.collect_list("__row").alias("__rows"))

    def cmp_rows(a, b):
        # multi-column asc, nulls first — W.orderBy's default collation
        expr = F.lit(0)
        for c in reversed(order_cols):
            ac, bc = a[c], b[c]
            expr = (
                F.when(ac.isNull() & bc.isNull(), expr)
                .when(ac.isNull(), F.lit(-1))
                .when(bc.isNull(), F.lit(1))
                .when(ac < bc, F.lit(-1))
                .when(ac > bc, F.lit(1))
                .otherwise(expr)
            )
        return expr

    assembled = (
        grouped.withColumn("__valid", F.filter("__rows", lambda r: r[valid_col]))
        .withColumn("__taken", F.expr(f"transform(__valid, r -> r.{number_col})"))
        .withColumn(
            "__needy",
            F.array_sort(F.filter("__rows", lambda r: ~r[valid_col]), cmp_rows),
        )
        .withColumn(
            "__free",
            F.array_except(
                F.sequence(
                    F.lit(1).cast(number_type),
                    (
                        F.size("__rows") + F.coalesce(F.array_max("__taken"), F.lit(0))
                    ).cast(number_type),
                ),
                F.col("__taken"),
            ),
        )
        .withColumn(
            "__out",
            F.concat(
                F.transform(
                    "__valid",
                    lambda r: F.struct(
                        r.alias("__r"), r[number_col].alias("__n")
                    ),
                ),
                F.transform(
                    "__needy",
                    lambda r, i: F.struct(
                        r.alias("__r"),
                        F.get("__free", i).cast(number_type).alias("__n"),
                    ),
                ),
            ),
        )
    )
    exploded = assembled.select(*g, F.explode("__out").alias("__e"))
    final_cols = [
        F.col(c) if c in group_cols else F.col(f"__e.__r.{c}").alias(c)
        for c in df.columns
    ]
    return exploded.select(*final_cols, F.col("__e.__n").alias(out_col))


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int, rank_col: str = "rank"
) -> DataFrame:
    """Per-group top-k with 1-based rank (precompute_similar_tracks.py:259-269)."""
    w = W.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
