"""Fact-table aggregate/join shapes over orders/lineitem/events
(split from relational2.py, round 8 — no behavior change): the
TPC-H-style rollup/percentile/top-k/cube family plus the skew
handling pair (salted join, key-skew profile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


_SALTED_ORACLE = """
WITH fact AS (
  SELECT l_orderkey, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, l_linenumber,
         CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 100 END AS hot_key
  FROM lineitem
), dim AS (
  SELECT DISTINCT CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 100 END AS hot_key
  FROM lineitem
), attrs AS (
  SELECT hot_key, 'seg_' || (hot_key % 7) AS segment, 10 + (hot_key % 5) AS factor_tenths
  FROM dim
)
SELECT a.segment,
       count(*) AS n_rows,
       CAST(sum(f.cents * a.factor_tenths) AS BIGINT) AS weighted_revenue_mills
FROM fact f JOIN attrs a USING (hot_key)
GROUP BY a.segment
"""


@query("salted_skew_join", oracle=_SALTED_ORACLE)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through an 8-way salt, value-identical to the plain
    join (which is exactly what the oracle computes — the salt must be
    invisible in results).

    The constructed key is pathological by design: ~70% of lineitem rows
    collapse onto key 0. Unsalted, every one of those rows lands in ONE
    join task — the classic straggler. `operators/skew.salted_join`
    scatters them across 8 sub-keys (deterministic salt from the row id;
    the dimension side replicates ×8 with a row-local explode), then the
    aggregate proceeds normally. AQE's skew split covers sort-merge
    cases it can observe; the salt is the plan-level guarantee that
    works under any join strategy, which is why both are in the engine.
    """
    from tlmc_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    hot = F.when(F.col("l_orderkey") % 10 < 7, 0).otherwise(
        F.col("l_orderkey") % 100
    )
    # Weighted revenue accumulates in exact integer units (cents ×
    # factor-tenths): double summation is order-dependent, and a salted
    # join *reorders* partial sums by construction, so a float agg can
    # land either side of a rounding boundary run-to-run — and even a
    # single final round() diverges across engines at an exact .xx5
    # (Java BigDecimal.valueOf rounds the shortest decimal repr, C
    # rounds the binary value). The result stays integer mills.
    fact = li.select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_linenumber",
        hot.alias("hot_key"),
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("row_uid"),
    )
    attrs = (
        fact.select("hot_key")
        .distinct()
        .select(
            "hot_key",
            F.concat(F.lit("seg_"), (F.col("hot_key") % 7)).alias("segment"),
            (F.lit(10) + F.col("hot_key") % 5).alias("factor_tenths"),
        )
    )
    joined = salted_join(fact, attrs, "hot_key", "row_uid", n_salts=8)
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("cents") * F.col("factor_tenths")).alias(
            "weighted_revenue_mills"
        ),
    )

@query(
    "hierarchy_rollup_totals",
    oracle="""
SELECT coalesce(r_name, '<all>')                       AS region_name,
       coalesce(n_name, '<all>')                       AS nation_name,
       CAST(grouping(r_name) + grouping(n_name) AS INT) AS lvl,
       count(*)                                        AS n_customers,
       CAST(round(sum(c_acctbal), 2) AS DOUBLE)        AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def hierarchy_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation → grand-total hierarchy in ONE pass:
    `rollup(region, nation)` expands to the three grouping sets inside a
    single shuffle with map-side partial aggregation — the OLAP subtotal
    ladder without re-scanning per level (the hand-rolled alternative is
    one job per level plus a union). `grouping()` flags distinguish a
    genuine NULL key from a subtotal row; both engines coalesce to the
    same '<all>' sentinel so the value-hash compares.

    Scale shape: expansion happens AFTER the partial agg (rows multiply
    by grouping-set count only in the combine phase, already reduced to
    group cardinality); the two dim joins broadcast (25 nations, 5
    regions).
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            (F.grouping("r_name") + F.grouping("n_name")).cast("int").alias("lvl"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "lvl",
            "n_customers",
            "total_acctbal",
        )
    )


@query(
    "order_value_percentiles",
    oracle="""
SELECT o_orderpriority,
       count(*)                                                AS n_orders,
       CAST(round(quantile_cont(o_totalprice, 0.5), 4) AS DOUBLE)  AS p50,
       CAST(round(quantile_cont(o_totalprice, 0.9), 4) AS DOUBLE)  AS p90,
       CAST(round(quantile_cont(o_totalprice, 0.99), 4) AS DOUBLE) AS p99
FROM orders
GROUP BY o_orderpriority
""",
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (p50/p90/p99 of order value by
    priority) via Spark's sort-based `percentile` aggregate — linear
    interpolation, the same estimator as DuckDB's quantile_cont, so the
    values compare bit-for-round. Exact percentiles shuffle the full
    column per group; the approx_percentile / t-digest form is the
    bounded-memory scale path when groups are huge, with this exact form
    as its small-sf differential oracle (the same exact↔approx pairing
    the dedup and ANN families use).
    """
    orders = load_table(spark, sf_dir, "orders")
    pcts = F.expr(
        "percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))"
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), pcts.alias("p"))
        .select(
            "o_orderpriority",
            "n_orders",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p90"),
            F.round(F.col("p")[2], 4).alias("p99"),
        )
    )


@query("order_value_percentiles_approx")
def order_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory percentiles: approx_percentile at accuracy 10000
    (a Greenwald-Khanna style mergeable summary — per-group state is
    O(accuracy), independent of group size, and partials combine
    map-side). The scale path for order_value_percentiles: exact
    percentiles must hold every group value through the shuffle, this
    holds a fixed sketch. Ext tier: the estimator is Spark-specific, so
    verification is the differential contract vs the exact form
    (tests/test_ext_query_contracts.py — rank error within 1/accuracy,
    plus p50<=p90<=p99 monotonicity), the exact↔approx pairing the
    dedup and ANN families use.
    """
    orders = load_table(spark, sf_dir, "orders")
    pcts = F.expr(
        "approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), 10000)"
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), pcts.alias("p"))
        .select(
            "o_orderpriority",
            "n_orders",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p90"),
            F.round(F.col("p")[2], 4).alias("p99"),
        )
    )


@query(
    "shipping_priority_topk",
    oracle="""
SELECT l_orderkey,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers x date-filtered orders x
    lineitem, revenue per order, global top-10. The canonical big-fact
    shuffle-join benchmark: both dimension filters must reach their
    parquet scans BEFORE the joins, the filtered customer side broadcasts
    into orders, and the top-10 rides TakeOrderedAndProject (a per-
    partition heap + driver-side merge of 10-row heads) — never a global
    sort of the full aggregate. Ties broken by orderkey so both engines
    cut the same 10 rows.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(
            F.broadcast(
                orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
                .select("o_orderkey", "o_orderdate")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "nation_balance_moments",
    oracle="""
SELECT n_name,
       count(*)                                             AS n_customers,
       CAST(round(stddev_samp(c_acctbal), 4) AS DOUBLE)     AS bal_stddev,
       CAST(round(var_samp(c_acctbal), 4) AS DOUBLE)        AS bal_var,
       CAST(round(corr(c_acctbal, c_custkey % 1000), 6) AS DOUBLE)       AS bal_key_corr,
       CAST(round(covar_samp(c_acctbal, c_custkey % 1000), 4) AS DOUBLE) AS bal_key_covar
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def nation_balance_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per nation: sample stddev/variance of
    account balance plus correlation/covariance against a synthetic
    second variable. All five aggregates are single-pass mergeable
    partials (sum, sum-of-squares, co-moments) — one shuffle carries the
    whole moment vector, the same partial-agg shape as sums. Estimator
    choice pinned cross-engine: _samp (n-1) variants, which Spark and
    DuckDB define identically; skewness/kurtosis are deliberately
    excluded (the engines disagree on bias correction)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    x2 = F.pmod(F.col("c_custkey"), F.lit(1000)).cast("double")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("bal_stddev"),
            F.round(F.var_samp("c_acctbal"), 4).alias("bal_var"),
            F.round(F.corr(F.col("c_acctbal"), x2), 6).alias("bal_key_corr"),
            F.round(F.covar_samp(F.col("c_acctbal"), x2), 4).alias("bal_key_covar"),
        )
    )

@query(
    "event_user_skew_profile",
    oracle="""
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
  FROM events GROUP BY user_id
), summary AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
         count(*) AS n_keys,
         CAST(max(n_rows) AS BIGINT) AS max_rows
  FROM counts
), ranked AS (
  SELECT key, n_rows,
         row_number() OVER (ORDER BY n_rows DESC, key) AS rank
  FROM counts
)
SELECT r.rank, r.key, r.n_rows,
       CAST(round(r.n_rows / CAST(s.total_rows AS DOUBLE), 6) AS DOUBLE) AS share,
       s.n_keys,
       CAST(round(s.max_rows * s.n_keys / CAST(s.total_rows AS DOUBLE), 4) AS DOUBLE)
         AS skew_factor
FROM ranked r CROSS JOIN summary s
WHERE r.rank <= 10
""",
)
def event_user_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic over the event stream's user key: top-10 heaviest
    users with corpus share, key cardinality, and the max/mean skew
    factor — the measurement that picks a mitigation (salted_join for a
    named hot key, AQE split for diffuse skew, nothing near 1.0). See
    operators/skew.py:key_skew_profile for the plan shape."""
    from tlmc_etl_spark.operators.skew import key_skew_profile

    events = load_table(spark, sf_dir, "events")
    return key_skew_profile(events, "user_id", top_k=10)

@query(
    "local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-way join (customer x orders x lineitem x
    supplier x nation x region) with the LOCAL-supplier condition
    (c_nationkey = s_nationkey) that makes join ordering matter — the
    supplier join carries two predicates from different branches, so a
    bad order materializes customer x supplier early. Declared as plain
    DataFrame joins: Catalyst reorders, every dimension (customer here
    is date/region-pruned transitively) broadcasts under the threshold,
    and lineitem — the only at-scale table — is never on the build side.
    Year+region filters reach the scans before any join.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            # decimal accumulation before the 2dp round (q11/q19
            # hardening): at sf1 the double sum lands within an ulp of a
            # half-cent boundary and the engines round opposite ways
            # (caught by the round-13 sf1 parity sweep)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "promo_revenue_share",
    oracle="""
SELECT strftime(date_trunc('month', CAST(l_shipdate AS TIMESTAMP)), '%Y-%m') AS ship_month,
       CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE)
         AS promo_share_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY ship_month
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per ship month — conditional
    aggregation (CASE inside sum) over a fact x broadcast-dim join. Both
    the numerator and denominator ride ONE agg pass; the part dim
    broadcasts; the year filter reaches the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "supplier_part_reach",
    oracle="""
SELECT p_brand, p_type,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*)                  AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
""",
)
def supplier_part_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier reach per (brand, type) with a
    NOT-IN exclusion of negative-balance suppliers. The exclusion is a
    broadcast left-anti join (null-safe here: s_suppkey is a key column);
    the distinct count expands inside the single groupBy pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#13")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )

@query(
    "status_priority_cube",
    oracle="""
SELECT coalesce(o_orderstatus, '<all>')   AS status,
       coalesce(o_orderpriority, '<all>') AS priority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
       count(*) AS n_orders,
       CAST(round(avg(o_totalprice), 4) AS DOUBLE) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets — full cross
    stats, both one-dimension margins, and the grand total — in ONE
    shuffle with map-side partial agg (the Expand node multiplies rows
    only after the partial combine). gid disambiguates margin rows from
    genuine values, sentinel-coalesced identically on both engines.
    Completes the grouping-sets family next to hierarchy_rollup_totals."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("int")
            .alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
            "avg_price",
        )
    )
