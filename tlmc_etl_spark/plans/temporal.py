"""Temporal-join queries: as-of (point-in-time) and range (interval)
joins over the events stream.

These are the two join shapes event pipelines need that plain equi-joins
cannot express; both are implemented as shuffle-bounded compositions
(operators/asof.py, operators/interval.py) rather than the nested-loop
plans a naive condition join produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


@query(
    "asof_last_error",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type,
       m.last_error_id,
       CASE WHEN m.last_error_ts IS NULL THEN NULL
            ELSE CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(m.last_error_ts)) AS BIGINT)
       END AS lag_s
FROM events e
LEFT JOIN LATERAL (
  SELECT x.event_id AS last_error_id, x.ts AS last_error_ts
  FROM events x
  WHERE x.event_type = 'error' AND x.user_id = e.user_id AND x.ts <= e.ts
  ORDER BY x.ts DESC, x.event_id DESC
  LIMIT 1
) m ON true
ORDER BY e.event_id
""",
)
def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event annotated with the most recent 'error'
    event of the same user at or before it (inclusive — an error event
    matches itself), plus the lag in whole seconds.

    The operator is the union-trick form (operators/asof.py): one shuffle
    on user_id, one sort, marker carried by last(ignorenulls) — never a
    per-key join explosion. The oracle is an independent formulation
    (per-probe LATERAL top-1), so the semantics, including the
    greatest-id tie-break, are pinned from outside the algorithm.
    """
    from tlmc_etl_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    probes = events.select("event_id", "user_id", "ts", "event_type")
    markers = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    res = asof_join(
        probes,
        markers,
        key_col="user_id",
        probe_ts="ts",
        marker_ts="ts",
        marker_cols=["event_id", "ts"],
        marker_id="event_id",
    )
    lag_s = (
        F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")
    ).cast("bigint")
    return res.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("asof_event_id").alias("last_error_id"),
        lag_s.alias("lag_s"),
    ).orderBy("event_id")


@query(
    "value_band_range_join",
    oracle="""
SELECT e.event_id, b.band_id, round(e.value, 2) AS value
FROM events e
JOIN (
  SELECT CAST(k AS BIGINT) AS band_id, k * 20.0 AS lo, k * 20.0 + 30.0 AS hi
  FROM range(25) t(k)
) b ON e.value >= b.lo AND e.value < b.hi
ORDER BY e.event_id, b.band_id
""",
)
def value_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events matched to overlapping value bands
    [k·20, k·20+30) — every event lands in one or two bands.

    The operator (operators/interval.py) rewrites interval containment to
    a bucketed equi-join (explode intervals to covered buckets, hash-join
    on the fact's bucket, residual exact filter) — the plan Catalyst
    would otherwise express as BroadcastNestedLoopJoin, which is
    |facts|×|intervals| comparisons at any scale. The oracle uses the
    declarative BETWEEN form, so the rewrite is value-checked against the
    naive semantics.
    """
    from tlmc_etl_spark.operators.interval import range_join

    events = load_table(spark, sf_dir, "events")
    bands = spark.range(25).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20.0).alias("lo"),
        (F.col("id") * 20.0 + 30.0).alias("hi"),
    )
    joined = range_join(events, bands, "value", "lo", "hi", bucket_width=20.0)
    return joined.select(
        "event_id", "band_id", F.round("value", 2).alias("value")
    ).orderBy("event_id", "band_id")


@query(
    "event_resample_ffill",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, value,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         CAST(ts AS TIMESTAMP) AS tsu
  FROM events WHERE event_type = 'view'
), obs AS (
  SELECT user_id, bucket, value FROM (
    SELECT user_id, bucket, value,
           row_number() OVER (PARTITION BY user_id, bucket
                              ORDER BY tsu DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1
), spans AS (
  SELECT user_id, min(bucket) AS t0, max(bucket) AS t1 FROM ev GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
  FROM spans
)
SELECT g.user_id,
       strftime(g.bucket, '%Y-%m-%d %H:00')  AS bucket,
       CAST(round(last_value(o.value IGNORE NULLS)
                  OVER (PARTITION BY g.user_id ORDER BY g.bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  4) AS DOUBLE)              AS value_ffill,
       (o.value IS NOT NULL)                 AS is_observed
FROM grid g LEFT JOIN obs o USING (user_id, bucket)
""",
)
def event_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's 'view' value stream onto a 1-hour grid with
    forward fill — the gap-free time series every downstream temporal
    model (rate-of-change, EWMA, as-of features) assumes exists.

    Plan shape: per-(user, bucket) last-observation via one window pass;
    the grid materializes as a per-user `sequence(t0, t1, 1 hour)`
    explode off the span aggregate — rows scale with user-hours, never
    with a global calendar (a user active 3 days costs 72 rows at any
    corpus size); the fill is `last(value, ignoreNulls)` over the same
    per-user ordering the grid join already established. Two shuffles
    total (bucket dedup window; user grid/fill partitioning), both on
    the user key, so a 100 TB deployment inherits whatever user
    bucketing the events table already has.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            "event_id",
            "value",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("ts"),
        )
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("user_id", "bucket").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    obs = ev.withColumn("rn", rn).filter(F.col("rn") == 1).select(
        "user_id", "bucket", "value"
    )
    spans = ev.groupBy("user_id").agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("bucket"),
    )
    filled = (
        grid.join(obs, ["user_id", "bucket"], "left")
        .withColumn(
            "value_ffill",
            F.round(
                F.last("value", ignorenulls=True).over(
                    W.partitionBy("user_id")
                    .orderBy("bucket")
                    .rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
                4,
            ),
        )
    )
    return filled.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:00").alias("bucket"),
        "value_ffill",
        F.col("value").isNotNull().alias("is_observed"),
    )
