"""Relational (t2) query catalog over the TPC-H-ish tables.

Each query re-expresses one operator family from the reference's inventory
(SURVEY.md §2) as an idiomatic Spark plan, mapped onto the driver's synthetic
tables per FIXTURES.md §10. Reference file:line citations are in each
docstring so parity can be checked.

Scale notes (these run on ~600k rows locally but are written for 100 TB):
 - dimension joins (`nation`, `customer`, `part`) are explicitly broadcast;
 - aggregations are expressed so Spark's partial/final (map-side combine)
   applies — no collect-based logic anywhere;
 - argmax/mode use count→window-rank with deterministic tie-break rather
   than collect_list, so state per group is O(1) not O(rows);
 - every plan is a single declarative DataFrame tree: Catalyst handles
   pushdown, pruning and join strategy; AQE handles skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Scan / filter / aggregate
# --------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                   AS avg_qty,
       round(avg(l_discount), 4)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→aggregate (TPC-H Q1 shape).

    Models the reference's histogram/stat aggregations (extract_plan.py:684-703,
    AlbumTrackMetadataProcessor.cs:309-321). Pure map-side-combinable agg:
    at 100 TB this is one scan + one small shuffle of partial aggregates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "mode_vote",
    oracle="""
SELECT o_custkey, mode_priority FROM (
  SELECT o_custkey, o_orderpriority AS mode_priority,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
  FROM orders
  GROUP BY o_custkey, o_orderpriority
) t WHERE rn = 1
""",
)
def mode_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority vote (mode) per group with deterministic tie-break.

    Reference: album fields = most frequent value across its tracks' tags,
    `Counter.most_common(1)` (info_scanner_ph2.py:296-326). Tie order there is
    insertion order (non-deterministic); here ties break value-ascending
    (SURVEY.md §7.4-1). count→row_number keeps group state O(distinct values),
    map-side combinable — no collect_list at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("o_custkey").orderBy(F.col("cnt").desc(), F.col("o_orderpriority").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("mode_priority"))
    )


@query(
    "convention_date_fill",
    oracle="""
WITH dated AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE CAST(o_orderdate AS DATE) END AS known_date
  FROM orders
), md AS (
  SELECT o_orderpriority, known_date AS mode_date FROM (
    SELECT o_orderpriority, known_date,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY count(*) DESC, known_date ASC) AS rn
    FROM dated WHERE known_date IS NOT NULL
    GROUP BY o_orderpriority, known_date
  ) WHERE rn = 1
)
SELECT d.o_orderkey,
       coalesce(d.known_date, md.mode_date) AS filled_date,
       (d.known_date IS NULL)               AS was_filled
FROM dated d LEFT JOIN md USING (o_orderpriority)
""",
)
def convention_date_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mode date backfill (convention→release-date inference).

    Reference: group albums by ReleaseConvention, take the mode of known
    dates, backfill albums missing one (info_scanner_ph2.py:391-413). Nulls
    are synthesized deterministically (orderkey % 7) since the fixture has
    none. The mode table is tiny → broadcast back-join.
    """
    orders = load_table(spark, sf_dir, "orders")
    dated = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(F.to_date("o_orderdate")).alias("known_date"),
    )
    counts = (
        dated.filter(F.col("known_date").isNotNull())
        .groupBy("o_orderpriority", "known_date")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("o_orderpriority").orderBy(F.col("cnt").desc(), F.col("known_date").asc())
    mode_date = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("known_date").alias("mode_date"))
    )
    return dated.join(F.broadcast(mode_date), "o_orderpriority", "left").select(
        "o_orderkey",
        F.coalesce("known_date", "mode_date").alias("filled_date"),
        F.col("known_date").isNull().alias("was_filled"),
    )


@query(
    "collision_detect",
    oracle="""
SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day,
       count(*) AS n_colliding,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
FROM orders
GROUP BY o_custkey, CAST(o_orderdate AS DATE)
HAVING count(*) > 1
""",
)
def collision_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by-having-count>1 collision detection.

    Reference: albums claimed by >1 archive are collisions that block the
    build (extract_plan.py:634-649, extract.py:76-86). min/max stand in for
    the collect_list of claimants (kept aggregate-only for scale).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey", F.to_date("o_orderdate").alias("order_day"))
        .agg(
            F.count(F.lit(1)).alias("n_colliding"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .filter(F.col("n_colliding") > 1)
    )


@query(
    "programme_promote",
    oracle="""
SELECT l_orderkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING count(*) >= 3 AND sum(l_quantity) >= 50
""",
)
def programme_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count+sum threshold promotion (duration programme test).

    Reference: a directory with >=3 tracks and >=12 min total duration is
    promoted to a disc (disc_duration_guard.py:46-57,149-157).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum("l_quantity").alias("_tq"))
        .filter((F.col("n_items") >= 3) & (F.col("_tq") >= 50))
        .select("l_orderkey", "n_items", F.round("_tq", 2).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "three_way_enrich",
    oracle="""
SELECT o.o_orderkey, c.c_name, n.n_name AS nation_name, r.r_name AS region_name,
       round(o.o_totalprice, 2) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
""",
)
def three_way_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way dimension enrichment join.

    Reference: ph1 structure ⨝ ph2_track ⨝ ph2_album merge
    (info_scanner_ph3.py:34-84). All dims broadcast — at 100 TB the fact
    table never shuffles for these joins.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "o_orderkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


@query(
    "left_join_null_aware",
    oracle="""
WITH media AS (
  SELECT l_orderkey, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS line_total
  FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_orderkey
)
SELECT o.o_orderkey,
       coalesce(m.n_lines, 0)      AS n_lines,
       coalesce(m.line_total, 0.0) AS line_total,
       (m.l_orderkey IS NULL)      AS missing_media
FROM orders o LEFT JOIN media m ON o.o_orderkey = m.l_orderkey
""",
)
def left_join_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-aware coalesced columns.

    Reference: track → HLS manifest left join; misses are counted, not
    errors (AlbumTrackMetadataProcessor.cs:251-268); probe-result join with
    missing-probe tolerance (info_scanner_ph2.py:138-170).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    media = (
        li.filter(F.col("l_linestatus") == "F")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.round(F.sum("l_extendedprice"), 2).alias("line_total"))
    )
    joined = orders.join(media, orders.o_orderkey == media.l_orderkey, "left")
    return joined.select(
        "o_orderkey",
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("line_total", F.lit(0.0)).alias("line_total"),
        F.col("l_orderkey").isNull().alias("missing_media"),
    )


@query(
    "scd1_carry",
    oracle="""
WITH old AS (
  SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS stable_id,
         o_totalprice AS old_price
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT n.o_orderkey,
       coalesce(o.stable_id, md5('new-' || CAST(n.o_orderkey AS VARCHAR))) AS stable_id,
       (o.o_orderkey IS NOT NULL)   AS carried,
       round(n.o_totalprice, 2)     AS total_price
FROM orders n LEFT JOIN old o ON n.o_orderkey = o.o_orderkey
""",
)
def scd1_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existing-id carry join (SCD-1): keep prior ids, refresh attributes.

    Reference: AlbumRoot matching a previous run keeps its UUID while five
    metadata fields refresh (existing_id_metadata_update.py:20-45). Ids are
    deterministic hashes, not uuid7, so runs oracle-match (SURVEY.md §7.4-1).
    """
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("old_key"),
        F.md5(F.col("o_orderkey").cast("string")).alias("old_id"),
    )
    return orders.join(old, orders.o_orderkey == old.old_key, "left").select(
        "o_orderkey",
        F.coalesce("old_id", F.md5(F.concat(F.lit("new-"), F.col("o_orderkey").cast("string")))).alias("stable_id"),
        F.col("old_key").isNotNull().alias("carried"),
        F.round("o_totalprice", 2).alias("total_price"),
    )


@query(
    "rank_merge_full_outer",
    oracle="""
WITH by_bal AS (
  SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rank_bal
  FROM customer QUALIFY rank_bal <= 100
), by_cnt AS (
  SELECT o_custkey AS c_custkey,
         row_number() OVER (ORDER BY count(*) DESC, o_custkey) AS rank_cnt
  FROM orders GROUP BY o_custkey QUALIFY rank_cnt <= 100
), by_spend AS (
  -- decimal-sum-then-round before RANKING (the q11/q15/q19 hardening):
  -- a double sum is partition-order dependent, so logically-tied spends
  -- differ by ulps differently per engine and the rank cut diverges
  SELECT o_custkey AS c_custkey,
         row_number() OVER (
           ORDER BY CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) DESC,
                    o_custkey) AS rank_spend
  FROM orders GROUP BY o_custkey QUALIFY rank_spend <= 100
)
SELECT coalesce(b.c_custkey, c.c_custkey, s.c_custkey) AS c_custkey,
       b.rank_bal, c.rank_cnt, s.rank_spend
FROM by_bal b
FULL OUTER JOIN by_cnt c ON b.c_custkey = c.c_custkey
FULL OUTER JOIN by_spend s ON coalesce(b.c_custkey, c.c_custkey) = s.c_custkey
""",
)
def rank_merge_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-flavor rank merge via full outer join, nullable rank per flavor.

    Reference: style/raw/kde ranked CSVs merged into one row per
    (anchor, neighbor) with nullable rank columns
    (SimilarGroupProcessor.cs:9-31,112-168).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # Scale contract: never rank the corpus-sized table through a global
    # (unpartitioned) window — that serializes every row through ONE task.
    # Instead orderBy(...).limit(100) compiles to TakeOrderedAndProject
    # (parallel partial top-k on every partition, merge of 100-row heaps on
    # the driver side of the exchange), and only the ≤100 survivors flow
    # through the ranking window, whose single partition is then bounded by
    # construction (bounded_one_partition keeps WindowExec from warning
    # about a single partition that is ≤100 rows by design).  Same rows,
    # same ranks: row_number over the identical total order commutes with
    # taking the top 100 of that order.
    from tlmc_etl_spark.tuning import bounded_one_partition

    by_bal = (
        customer.select("c_custkey", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(100)
        .withColumn(
            "rank_bal",
            F.row_number().over(
                W.partitionBy(bounded_one_partition("c_custkey")).orderBy(
                    F.col("c_acctbal").desc(), F.col("c_custkey")
                )
            ),
        )
        .select("c_custkey", "rank_bal")
    )
    # spend accumulates DECIMAL(18,6) then rounds to 2dp BEFORE ranking:
    # the value feeds an ORDER BY whose top-100 cut must be engine- and
    # partitioning-invariant, and gen_scale's sf1 (10 copies of every
    # customer with identical order values) makes the hazard concrete —
    # double sums of the same multiset differ by ulps per copy and the
    # tied ranks diverge across engines (caught by the round-13 sf1
    # parity sweep).
    cnt = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("spend"),
    )
    by_cnt = (
        cnt.orderBy(F.col("cnt").desc(), F.col("o_custkey"))
        .limit(100)
        .withColumn(
            "rank_cnt",
            F.row_number().over(
                W.partitionBy(bounded_one_partition("o_custkey")).orderBy(
                    F.col("cnt").desc(), F.col("o_custkey")
                )
            ),
        )
        .select(F.col("o_custkey").alias("k1"), "rank_cnt")
    )
    by_spend = (
        cnt.orderBy(F.col("spend").desc(), F.col("o_custkey"))
        .limit(100)
        .withColumn(
            "rank_spend",
            F.row_number().over(
                W.partitionBy(bounded_one_partition("o_custkey")).orderBy(
                    F.col("spend").desc(), F.col("o_custkey")
                )
            ),
        )
        .select(F.col("o_custkey").alias("k2"), "rank_spend")
    )
    merged = by_bal.join(by_cnt, by_bal.c_custkey == by_cnt.k1, "full").withColumn(
        "k01", F.coalesce("c_custkey", "k1")
    )
    merged = merged.join(by_spend, merged.k01 == by_spend.k2, "full")
    return merged.select(
        F.coalesce("k01", "k2").alias("c_custkey"), "rank_bal", "rank_cnt", "rank_spend"
    )


@query(
    "anti_join_audit",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
ANTI JOIN orders o ON c.c_custkey = o.o_custkey
""",
)
def anti_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti audit join: rows unaccounted for by the other side.

    Reference: release roots not in Source∪Excluded refuse the build
    (extract_plan.py:245-280,335-345). Here: customers with no orders.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "semi_join_gather",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders o
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
""",
)
def semi_join_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi gather: keep rows that have a qualifying match.

    Reference: chunk-store gather(ids) silently skips unknown ids
    (chunk_store.py:168-196) — a semi-join against the index.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total_price")
    )


# --------------------------------------------------------------------------
# Windows / renumbering
# --------------------------------------------------------------------------


@query(
    "topk_per_group",
    oracle="""
SELECT l_orderkey AS anchor, l_partkey AS neighbor, rnk AS rank,
       round(l_extendedprice, 2) AS score
FROM (
  SELECT l_orderkey, l_partkey, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_partkey ASC) AS rnk
  FROM lineitem
) t WHERE rnk <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k with 1-based rank.

    Reference: per-anchor top-100 neighbors by score
    (precompute_similar_tracks.py:259-269). row_number over a partitioned
    window — at scale this is one shuffle on the group key with partial
    top-k possible via AQE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc(), F.col("l_partkey").asc())
    return (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("l_orderkey").alias("anchor"),
            F.col("l_partkey").alias("neighbor"),
            "rank",
            F.round("l_extendedprice", 2).alias("score"),
        )
    )


@query(
    "dense_renumber",
    oracle="""
SELECT o_custkey, o_orderkey,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS ordinal
FROM orders
""",
)
def dense_renumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-group renumbering in a deterministic order.

    Reference: per release/disc dense track renumber
    (AlbumTrackMetadataProcessor.cs:184-197,221-238); ordinal preservation
    (AlbumTrackMetadataProcessor.cs:126-139).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("ordinal"))


@query(
    "gap_fill_numbering",
    oracle="""
WITH base AS (
  SELECT l_orderkey, l_partkey, l_linenumber,
         (l_quantity >= 10) AS is_valid
  FROM lineitem
), valid AS (
  SELECT l_orderkey, l_partkey, l_linenumber, l_linenumber AS track_number
  FROM base WHERE is_valid
), invalid_ranked AS (
  SELECT l_orderkey, l_partkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_partkey, l_linenumber) AS need_rank
  FROM base WHERE NOT is_valid
), bounds AS (
  SELECT l_orderkey,
         count(*) AS n_total,
         max(CASE WHEN is_valid THEN l_linenumber ELSE 0 END) AS max_valid
  FROM base GROUP BY l_orderkey
), pool AS (
  SELECT l_orderkey, unnest(generate_series(1, max_valid + n_total)) AS cand
  FROM bounds
), free AS (
  SELECT p.l_orderkey, p.cand,
         row_number() OVER (PARTITION BY p.l_orderkey ORDER BY p.cand) AS need_rank
  FROM pool p
  ANTI JOIN valid v ON p.l_orderkey = v.l_orderkey AND p.cand = v.track_number
)
SELECT l_orderkey, l_partkey, l_linenumber, track_number FROM valid
UNION ALL
SELECT i.l_orderkey, i.l_partkey, i.l_linenumber, f.cand AS track_number
FROM invalid_ranked i
JOIN free f ON i.l_orderkey = f.l_orderkey AND i.need_rank = f.need_rank
""",
)
def gap_fill_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill numbering: valid numbers keep, invalid get lowest free slot.

    Reference: per disc, tracks with trustworthy numbers keep them; each
    missing/-1 track gets the lowest unclaimed number in basename order —
    collision-proof by construction (info_scanner_ph3.py:42-84). Here
    'invalid' is simulated as l_quantity < 10.

    Spark shape: ONE shuffle (groupBy orderkey, partial-agg combined), then
    the whole gap-fill runs inside JVM higher-order array expressions per
    group — `sequence` builds a candidate pool bounded by max_valid+n_total,
    `array_except` (order-preserving) yields free slots, `array_sort` orders
    the needy rows, indexed `transform` zips k-th needy row with k-th free
    slot — no windows, no joins, no UDFs. Groups are disc-sized (≤ tens of
    rows), so per-group arrays are trivially small at any corpus scale.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    base = li.select(
        "l_orderkey",
        F.struct("l_partkey", "l_linenumber", (F.col("l_quantity") >= 10).alias("is_valid")).alias("row"),
    )
    grouped = base.groupBy("l_orderkey").agg(F.collect_list("row").alias("rows"))
    cmp_rows = (
        # struct comparison orders by (l_partkey, l_linenumber) — basename order
        lambda a, b: F.when(a["l_partkey"] < b["l_partkey"], -1)
        .when(a["l_partkey"] > b["l_partkey"], 1)
        .when(a["l_linenumber"] < b["l_linenumber"], -1)
        .when(a["l_linenumber"] > b["l_linenumber"], 1)
        .otherwise(0)
    )
    assembled = (
        grouped.withColumn("valid", F.filter("rows", lambda r: r["is_valid"]))
        .withColumn("taken", F.transform("valid", lambda r: r["l_linenumber"]))
        .withColumn("needy", F.array_sort(F.filter("rows", lambda r: ~r["is_valid"]), cmp_rows))
        .withColumn(
            "free",
            F.array_except(
                F.sequence(F.lit(1), F.size("rows") + F.coalesce(F.array_max("taken"), F.lit(0))),
                F.col("taken"),
            ),
        )
        .withColumn(
            "out",
            F.concat(
                F.transform(
                    "valid",
                    lambda r: F.struct(
                        r["l_partkey"].alias("l_partkey"),
                        r["l_linenumber"].alias("l_linenumber"),
                        r["l_linenumber"].cast("long").alias("track_number"),
                    ),
                ),
                F.transform(
                    "needy",
                    lambda r, i: F.struct(
                        r["l_partkey"].alias("l_partkey"),
                        r["l_linenumber"].alias("l_linenumber"),
                        F.get("free", i).cast("long").alias("track_number"),
                    ),
                ),
            ),
        )
    )
    return assembled.select("l_orderkey", F.explode("out").alias("r")).select(
        "l_orderkey", F.col("r.l_partkey"), F.col("r.l_linenumber"), F.col("r.track_number")
    )


# --------------------------------------------------------------------------
# Set operations / dedup
# --------------------------------------------------------------------------


@query(
    "dedup_keep_winner",
    oracle="""
SELECT c_nationkey, c_mktsegment, c_custkey AS winner_key, c_name AS winner_name,
       round(c_acctbal, 2) AS winner_bal
FROM (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) t WHERE rn = 1
""",
)
def dedup_keep_winner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-dedup keeping one deterministic winner per key.

    Reference: artist dedup — variants collapse onto one preferred id,
    preferring pre-existing entries (artist_deduplicator.py:30-73); canonical
    spelling fold winner = min(priority), tie→longest (extract_plan.py:375-416).
    """
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey", "c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("c_custkey").alias("winner_key"),
            F.col("c_name").alias("winner_name"),
            F.round("c_acctbal", 2).alias("winner_bal"),
        )
    )


@query(
    "union_priority_fold",
    oracle="""
WITH src AS (
  SELECT c_custkey, 1 AS priority, round(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey, 2 AS priority, round(c_acctbal + 100, 2) AS acctbal
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT c_custkey, priority, acctbal FROM (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY priority) AS rn
  FROM src
) t WHERE rn = 1
""",
)
def union_priority_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source union with priority-ordered winner per key.

    Reference: multi-root union merges release roots priority-ordered
    (extract_plan.py:419-468).
    """
    customer = load_table(spark, sf_dir, "customer")
    s1 = customer.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", F.lit(1).alias("priority"), F.round("c_acctbal", 2).alias("acctbal")
    )
    s2 = customer.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", F.lit(2).alias("priority"), F.round(F.col("c_acctbal") + 100, 2).alias("acctbal")
    )
    src = s1.unionByName(s2)
    w = W.partitionBy("c_custkey").orderBy("priority")
    return src.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


@query(
    "set_difference",
    oracle="""
SELECT DISTINCT o_custkey
FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT DISTINCT o_custkey
FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (pending = all − done).

    Reference: pending worklist = source − completed journal
    (loudness_measure.py:214-215, unextracted_snapshot.py:37-44).
    """
    orders = load_table(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return f_cust.exceptAll(o_cust)


# --------------------------------------------------------------------------
# Classifier cascades / scalar expressions
# --------------------------------------------------------------------------


@query(
    "rule_classifier_cascade",
    oracle="""
SELECT p_partkey,
       CASE
         WHEN p_size > 45                             THEN 'veto_oversize'
         WHEN regexp_matches(p_name, '^(red|blue|green)') THEN 'color_' || p_type
         WHEN p_type IN ('PROMO', 'ECONOMY')          THEN 'budget'
         WHEN regexp_matches(p_name, '(widget|gizmo)$')   THEN 'gadget'
         ELSE 'standard'
       END AS part_class
FROM part
""",
)
def rule_classifier_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered first-match regex/rule classifier with a hard veto tier.

    Reference: disc-vs-bonus directory classifier — ordered regex families
    with veto rules that can never be discs, measured 97.65%
    (disc_scanner.py:40-149, veto :104-132). Pure CASE WHEN rlike cascade —
    whole-stage-codegen'd, no UDF.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.when(F.col("p_size") > 45, F.lit("veto_oversize"))
        .when(F.col("p_name").rlike("^(red|blue|green)"), F.concat(F.lit("color_"), F.col("p_type")))
        .when(F.col("p_type").isin("PROMO", "ECONOMY"), F.lit("budget"))
        .when(F.col("p_name").rlike("(widget|gizmo)$"), F.lit("gadget"))
        .otherwise(F.lit("standard"))
        .alias("part_class"),
    )


@query(
    "wildcard_date_parse",
    oracle="""
WITH raw AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0
              THEN strftime(o_orderdate, '%Y.%m.') || 'xx'
              ELSE strftime(o_orderdate, '%Y.%m.%d') END AS date_str
  FROM orders
)
SELECT o_orderkey, date_str,
       CAST(substr(date_str, 1, 4) AS INTEGER) AS year,
       CAST(substr(date_str, 6, 2) AS INTEGER) AS month,
       CASE WHEN substr(date_str, 9, 2) = 'xx' THEN NULL
            ELSE CAST(substr(date_str, 9, 2) AS INTEGER) END AS day,
       (substr(date_str, 9, 2) = 'xx') AS is_partial
FROM raw
""",
)
def wildcard_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard-date parsing: `yyyy.mm.xx` strings → typed parts + flag.

    Reference: album dates are `\\d{4}.(\\d{2}|xx).(\\d{2}|xx)` strings with
    unknown parts as 'xx' (info_scanner_ph2.py:48-50,219-230), parsed to
    nullable dates at the DB boundary (AlbumTrackMetadataProcessor.cs:116).
    """
    orders = load_table(spark, sf_dir, "orders")
    raw = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.concat(F.date_format("o_orderdate", "yyyy.MM."), F.lit("xx")),
        )
        .otherwise(F.date_format("o_orderdate", "yyyy.MM.dd"))
        .alias("date_str"),
    )
    day_str = F.substring("date_str", 9, 2)
    return raw.select(
        "o_orderkey",
        "date_str",
        F.substring("date_str", 1, 4).cast("int").alias("year"),
        F.substring("date_str", 6, 2).cast("int").alias("month"),
        F.when(day_str == "xx", F.lit(None).cast("int")).otherwise(day_str.cast("int")).alias("day"),
        (day_str == "xx").alias("is_partial"),
    )


@query(
    "loudness_gain",
    oracle="""
WITH m AS (
  SELECT event_id,
         round(-1 * value / 10.0, 4)        AS i,
         round(-1 * value / 100.0, 4)       AS tp
  FROM events
)
SELECT event_id, i, tp,
       CASE WHEN i IS NULL OR i <= -60 THEN 0.0
            ELSE round(least(least(-14.0 - i, -1.0 - tp), 12.0), 4)
       END AS gain_db
FROM m
""",
)
def loudness_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudness static-gain formula as a pure column expression.

    Reference: gain = min(target_i − i, target_tp − tp), capped at +12 dB,
    forced 0 for silence (i ≤ −60 LUFS) or non-finite measurements
    (loudness_measure.py:72-108). Synthetic i/tp are derived from
    events.value deterministically.
    """
    events = load_table(spark, sf_dir, "events")
    m = events.select(
        "event_id",
        F.round(F.col("value") * -1 / 10.0, 4).alias("i"),
        F.round(F.col("value") * -1 / 100.0, 4).alias("tp"),
    )
    gain = F.least(F.least(F.lit(-14.0) - F.col("i"), F.lit(-1.0) - F.col("tp")), F.lit(12.0))
    return m.select(
        "event_id",
        "i",
        "tp",
        F.when(F.col("i").isNull() | (F.col("i") <= -60), F.lit(0.0))
        .otherwise(F.round(gain, 4))
        .alias("gain_db"),
    )


@query(
    "storage_key_relativize",
    oracle="""
SELECT p_partkey,
       CASE WHEN p_type = 'PROMO'
            THEN NULL
            ELSE 'parts/' || p_brand || '/' || replace(p_name, ' ', '_') END AS storage_key
FROM part
""",
)
def storage_key_relativize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path relativize / storage-key synthesis with out-of-root → null.

    Reference: absolute path → root-relative storage key, null outside root
    (AlbumTrackMetadataProcessor.cs:295-307); path-safe character
    substitution (CueSplit.cs:37-76).
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.when(F.col("p_type") == "PROMO", F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit("parts/"), F.col("p_brand"), F.lit("/"), F.regexp_replace("p_name", " ", "_"))
        )
        .alias("storage_key"),
    )
