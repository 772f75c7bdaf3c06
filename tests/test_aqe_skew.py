"""AQE skew-join gate: the runtime half of the skew story.

The repo's salted_skew_join is the PLAN-level mitigation (explicit salt
when you know the hot key). This gate proves the RUNTIME half works in
this engine configuration: with AQE's skew-join handling on, a join
whose probe side is dominated by one hot key gets its oversized
partition SPLIT at execution time — visible as `skew=true` on the
sort-merge join in the final adaptive plan. Together they cover both
regimes at 100 TB: known hot keys get salted in the plan, unknown ones
get split by AQE without any code change.

Thresholds are lowered inside the test (the defaults trigger at 256 MB
partitions — nothing at test scale) and restored afterward.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


TUNED = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ so skew split applies
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in TUNED}
    for k, v in TUNED.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_the_hot_key_partition(spark, skew_conf):
    # 70% of the fact rides ONE key; dim is uniform. Payload pads rows so
    # the hot partition crosses the lowered byte threshold.
    fact = spark.range(0, 40_000).select(
        F.when(F.col("id") % 10 < 7, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
    )
    dim = spark.range(0, 97).select(F.col("id").alias("k"), F.lit("d").alias("tag"))
    joined = fact.join(dim, "k")
    # collect() (not count()) so the inspected queryExecution is the one
    # that actually ran — count() builds its own execution with an agg on
    # top and leaves this DataFrame's adaptive plan un-finalized.
    n = len(joined.collect())
    assert n == 40_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:1500]


def test_session_aqe_is_on_by_default(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


AQE_BHJ_CONF = {
    # static planner must NOT broadcast (pretend stats are unknown/huge)...
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # ...but the runtime, seeing the ACTUAL shuffled bytes, may
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
}


@pytest.fixture()
def aqe_bhj_conf(spark):
    old = {k: spark.conf.get(k, None) for k in AQE_BHJ_CONF}
    for k, v in AQE_BHJ_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_converts_smj_to_broadcast_at_runtime(spark, aqe_bhj_conf):
    """The join-strategy half of AQE: when static stats force a sort-merge
    plan but the true build side is tiny, the runtime re-plans it as a
    broadcast join after seeing actual shuffle sizes. At 100 TB this is
    what rescues filtered dims whose pre-filter file stats looked huge."""
    fact = spark.range(0, 50_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 500).select(F.col("id").alias("k"), F.lit("d").alias("tag"))
    joined = fact.join(dim, "k")

    static_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in static_plan and "isFinalPlan=false" in static_plan

    assert len(joined.collect()) == 50_000
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "BroadcastHashJoin" in final_plan, final_plan[:1500]
