"""Bucketed co-located join: the layout must remove the shuffle.

Writes orders and lineitem bucketed on the join key, then proves the
bucketed join plans with ZERO Exchange while the identical unbucketed
join shuffles — and that both joins return identical results.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from tlmc_etl_spark.sinks.bucketed import read_table, write_bucketed
from tlmc_etl_spark.sources.tables import load_table


def plan_text(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    write_bucketed(orders, "bkt_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def _joined(spark, left, right):
    # aggregate on the bucket key itself so a co-bucketed plan needs no
    # exchange anywhere (join AND agg both reuse the stored distribution)
    return left.join(right, "o_orderkey").groupBy("o_orderkey", "o_custkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("v")
    )


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    bo = read_table(spark, "bkt_orders")
    bl = read_table(spark, "bkt_lineitem")
    # broadcast would hide the point at test scale: force the join to
    # resolve through distribution requirements
    autob = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_text(_joined(spark, bo, bl))
        assert "Exchange" not in plan, (
            "co-bucketed join must start from the stored distribution"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autob)


def test_unbucketed_join_pays_the_shuffle(spark, sf_dir, bucketed_tables):
    orders, lineitem = bucketed_tables
    autob = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_text(
            _joined(
                spark, orders, lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            )
        )
        assert "Exchange" in plan, "control case: parquet scan sides must shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autob)


def test_bucketed_and_plain_joins_agree(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    bo = read_table(spark, "bkt_orders")
    bl = read_table(spark, "bkt_lineitem")
    got = {
        (r["o_orderkey"], r["o_custkey"]): r["v"]
        for r in _joined(spark, bo, bl).collect()
    }
    want = {
        (r["o_orderkey"], r["o_custkey"]): r["v"]
        for r in _joined(
            spark, orders, lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        ).collect()
    }
    assert got == want
