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
