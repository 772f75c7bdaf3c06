"""Correlated-subquery decorrelation shapes (t2, TPC-H Q4/Q15/Q17/Q18/Q22).

The reference asks audit-style correlated questions all over its
snapshot/guard passes: "files with no completed-journal entry"
(Preprocessor/Extract/unextracted_snapshot.py:44 — membership against
every completed list), "directories that carry a real programme —
enough tracks AND enough minutes"
(Processor/InfoCollector/AlbumInfo/disc_duration_guard.py:50-51,154-155
— an aggregate-threshold HAVING), "which sub-bucket is heaviest so the
node split can be chosen from real remaining counts"
(Postprocessor/HlsTranscode/rebalance/shard_math.py:10-38 — a scalar
max over per-bucket totals). In SQL those are correlated subqueries and
engines decorrelate them automatically; on Spark the idiomatic forms
are explicit and each query here pins one:

 - EXISTS           -> left-semi join               (`q4_priority_exists`)
 - scalar MAX       -> 1-row agg broadcast-joined   (`q15_top_supplier`)
 - correlated AVG   -> aggregate-then-join          (`q17_small_qty_revenue`)
 - IN (agg HAVING)  -> semi join on aggregated keys (`q18_large_orders`)
 - NOT EXISTS + scalar AVG -> anti join + broadcast (`q22_idle_customers`)

100 TB notes: every subquery side is either a per-key aggregate (shuffles
once on the same key the outer join needs — Catalyst reuses the
partitioning) or a 1-row scalar (broadcast). No correlated re-execution,
no driver-side values: the scalar thresholds travel as broadcast joins,
never as collected literals, so the plan is one DAG end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


@query(
    "q4_priority_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1995-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join.

    Models the reference's journal-membership scans — "entries with at
    least one matching completed-list row" (unextracted_snapshot.py:44,
    inverted). The probe side is filtered and
    deduplicated BY the semi join itself — no distinct needed; at 100 TB
    the orders date filter prunes partitions before the shuffle and the
    semi join never materializes lineitem columns.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flagged = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(flagged, orders.o_orderkey == flagged.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar MAX subquery as a 1-row broadcast join.

    Models "the heaviest sub-bucket decides the node split" accounting
    (shard_math.py:10-38, per-bucket totals -> choose max). Naively
    expressing the scalar subquery as two consumers of the revenue CTE
    makes Spark scan lineitem TWICE (no automatic subtree reuse across
    consumers) — at 100 TB that doubles the fact scan. Instead the max
    rides an unpartitioned window over the ALREADY-AGGREGATED rows (one
    per supplier — bounded, dimension-sized), so lineitem is scanned
    once and the single-partition window pass touches only small data.
    Comparing on the ROUNDED revenue keeps the float tie-break identical
    between engines (registry convention); verified against the oracle
    at sf0.001 through sf1.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.withColumn(
        "max_revenue", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_revenue"))
    return (
        sup.join(top, sup.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG decorrelated to aggregate-then-join.

    Models "directories far below their album's mean duration" bonus-vs-
    disc flags (disc_duration_guard.py:12-24 duration comparison). Scale
    shape: the brand filter semi-joins lineitem FIRST, so the per-part
    average aggregates only the ~1/25 of lineitem that can matter; the
    per-part threshold then joins back on the same l_partkey
    partitioning (one shuffle, reused), and `part` is broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    brand_li = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"), "inner"
    ).drop("p_partkey")
    threshold = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cutoff")
    )
    return (
        brand_li.join(threshold, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, order_date, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN (aggregated HAVING) as a semi join on agg keys.

    Models the PROMOTE guard — "a directory is a disc if it carries >=
    MIN_TRACKS and >= MIN_MINUTES" (disc_duration_guard.py:50-51,154-155,
    aggregate threshold per group). The HAVING aggregate shuffles lineitem on
    l_orderkey — the SAME key the outer join needs, so Catalyst reuses
    the exchange; customer is broadcast. No IN-list ever reaches the
    driver.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "leftsemi")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@query(
    "q22_idle_customers",
    oracle="""
SELECT c_nationkey AS cntry, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS anti join + scalar AVG broadcast.

    Models the unextracted-snapshot anti scan — "files with NO
    completed-journal entry" (unextracted_snapshot.py:44) plus an
    above-average balance gate. The scalar mean travels
    as a 1-row broadcast cross join (never a collected literal — the
    plan stays one DAG and re-optimizes per run); the NOT EXISTS is a
    left-anti join against the date-pruned orders slice.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    mean_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("mean_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(mean_bal))
        .filter(F.col("c_acctbal") > F.col("mean_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "leftanti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )
