"""As-of join and range join: semantics on known frames + plan gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.asof import asof_join
from tlmc_etl_spark.operators.interval import range_join
from tlmc_etl_spark.plans import QUERIES


class TestAsofJoin:
    def test_known_frame_semantics(self, spark):
        # probes at t=1,5,10; markers at t=0,5,7 — inclusive match at t=5
        probes = spark.createDataFrame(
            [(1, 100, 1), (2, 100, 5), (3, 100, 10), (4, 200, 3)],
            "pid long, k long, t long",
        )
        markers = spark.createDataFrame(
            [(11, 100, 0), (12, 100, 5), (13, 100, 7)],
            "mid long, k long, t long",
        )
        got = {
            r["pid"]: r["asof_mid"]
            for r in asof_join(
                probes, markers, "k", "t", "t", ["mid", "t"], "mid"
            ).collect()
        }
        # t=1 -> marker at 0; t=5 -> marker at 5 (inclusive); t=10 -> 7;
        # key 200 has no markers -> null
        assert got == {1: 11, 2: 12, 3: 13, 4: None}

    def test_tie_among_markers_picks_greatest_id(self, spark):
        probes = spark.createDataFrame([(1, 1, 5)], "pid long, k long, t long")
        markers = spark.createDataFrame(
            [(21, 1, 5), (23, 1, 5), (22, 1, 5)], "mid long, k long, t long"
        )
        [r] = asof_join(probes, markers, "k", "t", "t", ["mid"], "mid").collect()
        assert r["asof_mid"] == 23

    def test_null_marker_column_does_not_desync(self, spark):
        # the marker payload travels as one struct: a null in one column
        # must not fall back to an older marker's value for that column
        probes = spark.createDataFrame([(1, 1, 10)], "pid long, k long, t long")
        markers = spark.createDataFrame(
            [(31, 1, 1, "old"), (32, 1, 5, None)],
            "mid long, k long, t long, tag string",
        )
        [r] = asof_join(probes, markers, "k", "t", "t", ["mid", "tag"], "mid").collect()
        assert r["asof_mid"] == 32 and r["asof_tag"] is None

    def test_plan_is_window_not_join(self, spark, sf_dir):
        plan = (
            QUERIES["asof_last_error"]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan, "as-of must be the union+window form, not a join"
        assert "Window" in plan


class TestRangeJoin:
    def _frames(self, spark):
        facts = spark.createDataFrame(
            [(1, 0.0), (2, 9.99), (3, 10.0), (4, 25.0), (5, -3.0)],
            "fid long, v double",
        )
        ivals = spark.createDataFrame(
            [(10, 0.0, 10.0), (20, 5.0, 30.0), (30, 50.0, 50.0), (40, -10.0, 0.0)],
            "iid long, lo double, hi double",
        )
        return facts, ivals

    def test_half_open_and_empty_interval(self, spark):
        facts, ivals = self._frames(spark)
        got = {
            (r["fid"], r["iid"])
            for r in range_join(facts, ivals, "v", "lo", "hi", 10.0).collect()
        }
        # v=0.0 in [0,10) and NOT in [-10,0) (half-open); v=10.0 not in
        # [0,10) but in [5,30); empty [50,50) matches nothing
        assert got == {
            (1, 10),
            (2, 10),
            (2, 20),
            (3, 20),
            (4, 20),
            (5, 40),
        }

    def test_matches_naive_condition_join(self, spark):
        facts, ivals = self._frames(spark)
        naive = {
            (r["fid"], r["iid"])
            for r in facts.join(
                ivals, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
            ).collect()
        }
        bucketed = {
            (r["fid"], r["iid"])
            for r in range_join(facts, ivals, "v", "lo", "hi", 7.0).collect()
        }
        assert bucketed == naive

    def test_plan_avoids_nested_loop(self, spark, sf_dir):
        plan = (
            QUERIES["value_band_range_join"]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
