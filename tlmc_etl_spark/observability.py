"""Pipeline counters via Spark's Observation API — metrics that ride
the job instead of costing one.

The reference prints per-stage counters (files skipped, probes failed,
rows healed) from its imperative loops. The Spark-native form is
`df.observe(...)`: named aggregate expressions evaluated ON the rows
streaming through the SAME action — no second job, no cached subtree,
no race between the count and the run it describes. At 100 TB a
separate `df.filter(bad).count()` audit re-scans the table; an
observation is free.

Usage:
    stats, df = observe_counts(df, "probe_scan",
                               n_rows=F.count(F.lit(1)),
                               n_invalid=F.count(F.when(~F.col("valid"), 1)))
    df.write...   # any action
    stats.get     # {'n_rows': ..., 'n_invalid': ...}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_counts(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[Observation, DataFrame]:
    """Attach named aggregate metrics to `df`'s next action.

    Returns (observation, df'); read `observation.get` AFTER an action
    has materialized df'. Metrics must be aggregate expressions over the
    observed rows (count/sum/min/max/...), evaluated task-side and
    merged on the driver by the listener bus.
    """
    obs = Observation(name)
    return obs, df.observe(obs, *[v.alias(k) for k, v in metrics.items()])
