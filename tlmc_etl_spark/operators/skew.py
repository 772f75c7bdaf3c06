"""Skew mitigation: salted joins for pathologically hot keys.

AQE's runtime skew-join split (enabled session-wide) handles sort-merge
skew it can SEE — post-shuffle partition sizes. Salting is the plan-level
fix for the cases AQE can't save: a hot key whose rows must still meet a
non-broadcastable dimension side, stateful aggregations keyed on the hot
column, or engines/modes without AQE. The technique: the fact side
scatters each hot-key row across `n_salts` synthetic sub-keys
(deterministically — xxhash64 of a row-unique column, never rand(),
which would break retry/replay determinism); the dimension side
replicates once per salt via a row-local explode; the join key becomes
(key, salt), so the hot key's rows spread over n_salts tasks instead of
one straggler. Results are provably identical to the unsalted join —
each fact row meets exactly one replica of its dimension row — which is
what the DuckDB oracle on the registered query checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    row_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` to `dim` on `key` with an n_salts-way salt.

    `row_col` must be fact-side row-unique (or at least high-cardinality)
    — it seeds the deterministic salt. The dim side grows ×n_salts rows
    (cheap: dims are small by definition; if the dim were big enough for
    ×8 to hurt, the join belongs in AQE/sort-merge territory instead).

    Only fact-preserving join types are supported: under salting every
    dim row exists n_salts times, so a join that emits unmatched DIM rows
    ('right'/'full'/'right_semi'…) would emit each of them n_salts times
    — NOT equivalent to the unsalted join. Salt the other way around (or
    anti-join the dim against fact keys first) for those.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            f"×{n_salts}; supported: inner/left/left_semi/left_anti"
        )
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.col(row_col)), F.lit(n_salts)))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Key-distribution diagnostic: top-k heaviest keys with their corpus
    share plus global concentration metrics — the measurement that
    decides which skew mitigation a join needs (salted_join for a known
    hot key, AQE's runtime split for diffuse skew, nothing when
    skew_factor ~ 1).

    One groupBy(key) with map-side combine; the top-k cut is
    orderBy+limit, which Spark plans as TakeOrderedAndProject (a per-
    partition heap + driver merge of k rows, never a global sort);
    rank is derived AFTER the cut, as a window over the <= k surviving
    rows (one trivial task). The 1-row global summary broadcasts back
    onto it. Deterministic: ties broken by key value.

    Columns: rank, key (as string), n_rows, share, n_keys, skew_factor
    (= max key count / mean key count; >> 1 means a salted or AQE-split
    join is worth it).
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    summary = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("max_rows"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), "key").limit(top_k)
    # ranking a limit(top_k) result: bounded_one_partition silences the
    # single-partition warning for a window whose input is ≤top_k rows
    from tlmc_etl_spark.tuning import bounded_one_partition

    w = W.partitionBy(bounded_one_partition("n_rows")).orderBy(
        F.col("n_rows").desc(), "key"
    )
    top = top.withColumn("rank", F.row_number().over(w))
    return (
        top.crossJoin(F.broadcast(summary))
        .select(
            "rank",
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("total_rows"), 6).alias("share"),
            "n_keys",
            F.round(
                F.col("max_rows") * F.col("n_keys") / F.col("total_rows"), 4
            ).alias("skew_factor"),
        )
    )
