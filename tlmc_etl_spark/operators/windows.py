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
    number_type = df.schema[number_col].dataType
    # selectExpr strings, not per-column F.col(): each Column object is a
    # py4j round-trip and this operator is nested inside plan-construction
    # hot paths (the catalog builds it twice per delta batch)
    q = lambda c: f"`{c}`"
    base = df.selectExpr(
        *[q(c) for c in group_cols],
        "struct(" + ", ".join(q(c) for c in data_cols) + ") AS __row",
    )
    grouped = base.groupBy(*[q(c) for c in group_cols]).agg(
        F.collect_list("__row").alias("__rows")
    )

    # The whole gap-fill as ONE F.expr SQL string, one projection: the
    # previous form (5 chained withColumns of Column-API higher-order
    # lambdas) cost ~0.3 s of DRIVER time per call at any data scale —
    # each withColumn re-analyzes the growing upstream plan and every
    # F.transform/F.filter lambda is several py4j round-trips, and the
    # catalog nests this operator twice. The parser builds the identical
    # expressions in one call; the optimizer's CollapseProject produced
    # this inlined projection from the chained form anyway, so the
    # executed plan is unchanged.
    t = number_type.simpleString()
    cmp = "0"  # multi-column asc, nulls first — W.orderBy's default collation
    for c in reversed(order_cols):
        cmp = (
            f"CASE WHEN a.`{c}` IS NULL AND b.`{c}` IS NULL THEN ({cmp}) "
            f"WHEN a.`{c}` IS NULL THEN -1 WHEN b.`{c}` IS NULL THEN 1 "
            f"WHEN a.`{c}` < b.`{c}` THEN -1 WHEN a.`{c}` > b.`{c}` THEN 1 "
            f"ELSE ({cmp}) END"
        )
    valid = f"filter(__rows, r -> r.`{valid_col}`)"
    taken = f"transform({valid}, r -> r.`{number_col}`)"
    needy = f"array_sort(filter(__rows, r -> NOT r.`{valid_col}`), (a, b) -> {cmp})"
    free = (
        f"array_except(sequence(CAST(1 AS {t}), "
        f"CAST(size(__rows) + coalesce(array_max({taken}), 0) AS {t})), {taken})"
    )
    out = (
        f"concat("
        f"transform({valid}, r -> struct(r AS __r, r.`{number_col}` AS __n)), "
        f"transform({needy}, (r, i) -> struct(r AS __r, CAST(get({free}, i) AS {t}) AS __n)))"
    )
    assembled = grouped.selectExpr(
        *[q(c) for c in group_cols], f"{out} AS __out"
    )
    exploded = assembled.selectExpr(
        *[q(c) for c in group_cols], "explode(__out) AS __e"
    )
    return exploded.selectExpr(
        *[
            q(c) if c in group_cols else f"__e.__r.{q(c)} AS {q(c)}"
            for c in df.columns
        ],
        f"__e.__n AS {q(out_col)}",
    )


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int, rank_col: str = "rank"
) -> DataFrame:
    """Per-group top-k with 1-based rank (precompute_similar_tracks.py:259-269)."""
    w = W.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
