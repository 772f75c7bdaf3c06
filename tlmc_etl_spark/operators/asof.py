"""As-of join: for each probe row, the most recent marker row at or
before it, per key — the temporal join every event/state pipeline needs
(last config before this request, last error before this event, price as
of this trade).

Spark shape — the union trick, not a join: tag both sides, union them,
and carry the marker row forward with `last(..., ignorenulls=True)` over
a per-key window ordered by (ts, tag, marker id). That is ONE shuffle on
the key and one sort — cost identical to a window aggregate — whereas
the naive form (equi-join on key + ts filter + row_number) first
materializes |probes| × |markers-per-key| join rows. At 100 TB the union
form's cost tracks |probes| + |markers|; the naive form quadratically
amplifies hot keys.

Semantics are pinned to the inclusive convention (marker.ts <= probe.ts
matches; a marker row probing itself matches itself): markers sort BEFORE
probes at equal ts. Ties among markers at identical (key, ts) resolve to
the greatest marker id — deterministic under any partition layout. The
whole marker payload travels as ONE struct, so a null in an individual
marker column can never desynchronize the carried row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    markers: DataFrame,
    key_col: str,
    probe_ts: str,
    marker_ts: str,
    marker_cols: list[str],
    marker_id: str,
) -> DataFrame:
    """Left as-of join; marker columns arrive as `asof_<col>`, null when
    no marker precedes the probe.

    `marker_id` is the deterministic tie-break among markers sharing a
    timestamp (greatest id wins).
    """
    payload = list(probes.columns)
    tagged_p = probes.select(
        F.col(key_col).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__mid"),
        F.struct(*payload).alias("__probe"),
    )
    tagged_m = markers.select(
        F.col(key_col).alias("__k"),
        F.col(marker_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(marker_id).cast("long").alias("__mid"),
        F.struct(*[F.col(c) for c in marker_cols]).alias("__marker"),
    )
    tagged_p = tagged_p.withColumn(
        "__marker", F.lit(None).cast(tagged_m.schema["__marker"].dataType)
    )
    tagged_m = tagged_m.withColumn(
        "__probe", F.lit(None).cast(tagged_p.schema["__probe"].dataType)
    )
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__mid").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged_p.unionByName(tagged_m).select(
        "__tag",
        "__probe",
        F.last("__marker", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__probe.{c}").alias(c) for c in payload],
        *[F.col(f"__c.{c}").alias(f"asof_{c}") for c in marker_cols],
    )
