"""Runtime bloom-filter join pruning: the 100 TB technique for a
SELECTIVE join whose build side is too big to broadcast.

When a filtered dimension is past the broadcast threshold, the naive
plan shuffles the ENTIRE fact into a sort-merge join and discards most
of it at the join. Spark's runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled, on by default since
3.5) instead aggregates a bloom sketch of the build side's join keys
and injects `might_contain(...)` into the fact scan — rows that cannot
match die BEFORE the exchange, so the shuffle carries ~selectivity x
fact instead of all of it. At 100 TB that is the difference between
shuffling 100 TB and shuffling the ~1% that survives.

The two size thresholds exist so small facts don't pay sketch-build
cost; this test drops the application-side threshold to force the
rewrite at test scale — a 100 TB deployment keeps the defaults (10 GB
application side / 10 MB creation side), which engage exactly in the
regime the rewrite is designed for.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.sources.tables import load_table

BLOOM_CONFS = {
    # force SMJ: the point is the no-broadcast regime
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # test-scale facts are far below the production 10GB gate
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@contextlib.contextmanager
def _confs(spark, sets: dict[str, str]):
    saved: dict[str, str | None] = {}
    for k, v in sets.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _selective_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"), F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_injected_into_fact_side(spark, sf_dir):
    with _confs(spark, BLOOM_CONFS):
        plan = _formatted(_selective_join(spark, sf_dir))
    # the sketch is aggregated over the FILTERED build side's keys...
    assert "bloom_filter_agg" in plan, plan
    assert "o_orderkey" in plan.split("bloom_filter_agg")[1][:80], plan
    # ...and applied as a might_contain predicate on the probe side
    assert "might_contain" in plan, plan


def test_bloom_filtered_join_matches_unfiltered_answer(spark, sf_dir):
    # the rewrite is an optimization, never a semantics change
    baseline = {tuple(r) for r in _selective_join(spark, sf_dir).collect()}
    with _confs(spark, BLOOM_CONFS):
        rewritten = {tuple(r) for r in _selective_join(spark, sf_dir).collect()}
    assert rewritten == baseline


def test_defaults_do_not_sketch_tiny_facts(spark, sf_dir):
    # with production thresholds, test-scale data must NOT pay the
    # sketch-build: the gates exist so the rewrite only fires at scale
    with _confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        plan = _formatted(_selective_join(spark, sf_dir))
    assert "bloom_filter_agg" not in plan, plan
