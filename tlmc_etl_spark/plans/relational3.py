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
 - correlated MIN (argmin)  -> per-key window min   (`q2_min_cost_supplier`)
 - agg > global scalar      -> 1-row agg broadcast  (`q11_important_parts`)
 - outer-join count distribution                    (`q13_order_count_distribution`)
 - disjunctive OR-of-ANDs join residual             (`q19_disjunctive_revenue`)
 - EXISTS<>/NOT EXISTS<> self-correlation -> per-key
   distinct-count aggregates                        (`q21_waiting_suppliers`)

The testdata schema is slimmer than full TPC-H (no partsupp, no
commit/receipt dates, no comments), so Q2/Q11/Q19/Q21 are re-cut onto
the columns that exist while keeping each query's DEFINING plan shape
intact — what is pinned is the decorrelation/pushdown pattern, not the
benchmark's literal predicate constants.

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
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
              AS DOUBLE) AS total_revenue
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
    makes Spark scan lineitem TWICE (measured: AQE compiles the two
    identical revenue shuffles as separate, un-reused query stages) —
    at 100 TB that doubles the fact scan. The round-12 shape avoided
    that with an unpartitioned `max() over ()` window, but that funnels
    every per-supplier row through ONE task; the supplier dimension
    grows with the corpus, so the plan-lint (test_plan_quality) bans
    the shape. Instead the per-supplier aggregate — the THIN table, two
    columns per supplier — is persisted: lineitem is scanned once to
    build the cache, the global max is a partial-aggregating 1-row
    `agg(max)` (local max per partition in parallel, single-row merge),
    and membership is a broadcast equality join back against the same
    cache. The revenue sum accumulates DECIMAL(18,6) before the 2dp
    round (q11/q19 hardening) — here the rounded value feeds an ==
    against the max, so ulp drift would change which SUPPLIERS appear,
    not just a displayed digit; the decimal sum makes membership
    engine- and partitioning-invariant. Verified against the oracle at
    sf0.001 through sf1.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            # Decimal-sum then round (the q11/q19 ulp-drift hardening):
            # here the rounded value feeds an EQUALITY against the max,
            # so a half-cent drift changes ROW MEMBERSHIP, not a digit.
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
        # Both consumers (max + membership join) read this cache, so the
        # fact table is scanned once. Dimension-thin (2 cols/supplier);
        # LRU-evictable, repo-standard for tiny multi-scan reuse tables.
        .persist()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    top = revenue.join(
        F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue")
    )
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


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         floor(min(l_extendedprice / l_quantity) * 100) / 100 AS unit_cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_name, s_suppkey, s_name, unit_cost
FROM cost
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size <= 10
  AND unit_cost = (SELECT min(unit_cost) FROM cost c2 WHERE c2.l_partkey = cost.l_partkey)
ORDER BY p_partkey, s_suppkey
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated argmin decorrelated to a per-key window MIN.

    Q2's defining pattern — "the supplier whose cost equals the minimum
    cost for that part" — re-cut onto lineitem (no partsupp in the
    schema): observed unit cost per (part, supplier), keep every
    supplier achieving the per-part minimum. Models the reference's
    best-mirror election (Postprocessor/FileSystem mirror selection —
    pick the copy whose metric ties the group minimum, keeping ties).

    Scale shape: the (part, supplier) aggregate shuffles lineitem once
    on l_partkey via the composite grouping key; the per-part MIN then
    rides a WINDOW over the already-aggregated rows (partitioned on
    l_partkey — dimension-sized input, no second fact scan and no
    self-join back). Ties survive by construction, so no float
    tie-break is needed; the cost is truncated to cents (floor(x*100)
    /100 — exact IEEE ops, unlike round() whose half-case handling
    differs between engines) BEFORE the min comparison so both engines
    compare identical values. part and supplier are broadcast dims.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    cost = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (F.floor(F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 100) / 100).alias(
                "unit_cost"
            )
        )
    )
    best = cost.withColumn(
        "min_cost", F.min("unit_cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    return (
        best.join(F.broadcast(part.filter(F.col("p_size") <= 10)), best.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sup), best.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey AS p_key,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
              AS DOUBLE) AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT p_key, part_value
FROM pv
WHERE part_value > (SELECT 1.5 * avg(part_value) FROM pv)
ORDER BY part_value DESC, p_key
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key aggregate filtered by a GLOBAL scalar
    over the same aggregate (HAVING sum(...) > f(SELECT ... FROM same)).

    Q11's defining pattern is the self-referencing global threshold —
    the subquery aggregates the SAME derived table the outer filters.
    Threshold re-cut as 1.5x the mean per-part value (TPC-H's fixed
    FRACTION constant must shrink with SF to select anything; a
    mean-multiple is sf-stable). Models the heaviest-bucket split
    election in shard_math.py:10-38 — per-bucket totals measured
    against a statistic of all buckets.

    Scale shape: lineitem shuffles ONCE into the per-part aggregate;
    the global mean is a 1-row aggregate of that dimension-sized result
    broadcast back as a cross join — Catalyst plans the derived table
    once, never re-scans the fact, and no literal travels through the
    driver.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Sum over DECIMAL, not DOUBLE: a double sum is order-dependent (ulp
    # drift between engines/partitionings flips round() at a half-cent
    # boundary — observed at sf1); the per-row product is the IDENTICAL
    # IEEE double in both engines, so casting it to decimal(18,6) and
    # summing exactly is engine- and partitioning-invariant.
    pv = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
            2,
        )
        .cast("double")
        .alias("part_value")
    )
    threshold = pv.agg((F.lit(1.5) * F.avg("part_value")).alias("cutoff"))
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("p_key", "part_value")
        .orderBy(F.col("part_value").desc(), "p_key")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT n_orders, count(*) AS custdist
FROM per_cust GROUP BY n_orders
ORDER BY custdist DESC, n_orders DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join count -> distribution of counts.

    The defining pattern: a LEFT join whose ON clause carries a
    filter on the RIGHT side (so zero-order customers survive with
    count 0 — a WHERE would delete them), a per-customer count that
    counts only MATCHED rows (count(col), not count(*)), then a second
    aggregation over the first's result. Models the reference's
    per-album track-count histogram used to pick convention heuristics
    (disc_scanner.py:40-53 — how many albums have k tracks).

    Scale shape: the right-side filter is pushed to the orders scan
    before the shuffle; the first aggregate shuffles on c_custkey (the
    join key — exchange reused); the second aggregates a
    cardinality-bounded result (distinct count values), so it collapses
    to a near-free final shuffle.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    filtered = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(filtered, cust.c_custkey == filtered.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("n_orders").desc())
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    The defining pattern: the filter is a disjunction whose branches
    each mix columns from BOTH tables, so no single branch can be
    pushed below the join whole — the optimizer must (a) still extract
    the common equi-join key, (b) push the per-table CNF residue
    (brand IN (...), quantity/size range hulls) below the join, and
    (c) evaluate the full disjunction as a join residual. Expressing it
    as one declarative filter lets Catalyst do exactly that — hand-
    splitting the OR into three unioned joins would scan the fact three
    times. Models the reference's rule-cascade file classifier
    (rule_classifier mixed any-of rules over joined metadata).

    Scale shape: part is a broadcast dim; lineitem is scanned once with
    the quantity range hull (1..30) pushed to parquet row groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    disj = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    # Decimal sum for the same order-invariance reason as q11: a global
    # double sum's ulp drift can flip the 2dp rounding between engines.
    return joined.filter(disj).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM li GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM li
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE li.late AND per_order.n_supp >= 2 AND per_order.n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS(<>) + NOT EXISTS(<>) self-correlation
    decorrelated to per-key distinct-count aggregates.

    The defining pattern: a row qualifies based on OTHER rows of the
    same table in the same group — "another supplier contributed to
    this order" (EXISTS with l_suppkey <>) and "no OTHER supplier was
    late" (NOT EXISTS with <> AND late). Instead of two self semi/anti
    joins (two extra shuffles of the fact, the naive rewrite), both
    predicates fold into ONE per-order pass: n_supp >= 2 gives the
    EXISTS, and — because the qualifying row is itself late —
    n_late_supp = 1 gives the NOT-EXISTS-other-late exactly. "Late" is
    re-cut as shipped >90 days after order date (no receipt/commit
    dates in the schema). Models the reference's mirror-blame pass:
    which mirror alone stalled a multi-mirror sync batch.

    Scale shape: the distinct counts ride WINDOW collect_sets over the
    l_orderkey partition rather than a groupBy + join-back — the naive
    aggregate-then-join re-computes the lineitem⋈orders subtree for
    each consumer (Spark gives derived tables no automatic subtree
    reuse; verified: that form scans the fact TWICE), while the window
    form scans and shuffles lineitem exactly once. Per-order supplier
    sets are small (order line counts), so the collected sets stay
    bytes-sized. The orders status filter is pushed to its scan;
    supplier is a broadcast dim.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    flagged = li.join(finished, li.l_orderkey == finished.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
    )
    w = W.partitionBy("l_orderkey")
    counted = flagged.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
    )
    return (
        counted.filter(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
