"""Range (interval-containment) join: match fact rows whose scalar value
falls inside [lo, hi) interval rows — band assignment, SLA windows,
score-bucket routing.

Spark's planner turns a bare `value >= lo AND value < hi` join condition
into BroadcastNestedLoopJoin (every fact row tested against every
interval — |facts|×|intervals| comparisons). The scale form here is the
standard bucketing rewrite: pick a bucket width, explode each interval
to the buckets it covers (row-local, no shuffle), bucket each fact row
by floor(value / width), equi-join on the bucket, and keep exact
containment with a residual filter. Catalyst then plans a hash join on
the bucket key, so cost follows matches + bucket collisions, never the
cross product; a fact row meets an interval in exactly one bucket (the
fact's own), so no post-join dedup is needed.

Width picks the trade: ≈ median interval length keeps the per-interval
explode factor ~2 while holding bucket collision rates low.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of facts to every interval with lo <= value < hi.

    Output: all fact columns + all interval columns. Intervals are
    half-open; an empty interval (hi <= lo) matches nothing.
    """
    w = float(bucket_width)
    # Guard empty intervals BEFORE the explode: Spark's sequence() walks
    # DESCENDING when stop < start, which would fabricate buckets.
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge never
                # reaches into that bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-12)) / w
                ).cast("long"),
            )
        ),
    )
    bucketed = facts.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    return (
        bucketed.join(exploded, "__bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
