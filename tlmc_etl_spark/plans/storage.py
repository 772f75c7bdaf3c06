"""Storage-layout and sketch queries: partitioned parquet + DPP,
mergeable HLL distinct-count rollups.

These are the two storage/streaming-adjacent mechanisms a 100 TB
deployment leans on hardest: a partition layout the optimizer can prune
(so recurring date-scoped scans never touch cold data), and mergeable
cardinality sketches (so distinct-user rollups combine across shards /
days / reruns without ever re-scanning raw events — the partial-agg
pattern applied to state, not just sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.dedup import portable_hash60 as _portable_hash60
from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.scratch import scratch_dir
from tlmc_etl_spark.sinks.partitioned import read_partitioned, write_partitioned
from tlmc_etl_spark.sources.tables import load_table


@query(
    "partitioned_month_rollup",
    oracle="""
WITH fact AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_totalprice, o_orderpriority
  FROM orders
), hot AS (
  SELECT DISTINCT o_month FROM fact
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
)
SELECT f.o_month,
       count(*) AS n_orders,
       CAST(round(sum(f.o_totalprice), 2) AS DOUBLE) AS total_price
FROM fact f JOIN hot USING (o_month)
GROUP BY f.o_month
""",
)
def partitioned_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-partitioned parquet lifecycle: write orders partitionBy(month),
    read back, join the fact scan against a runtime-derived hot-month dim
    (months containing an urgent >350k order) and aggregate.

    The month set is NOT a literal — it exists only after scanning the
    dim side — so the only way the fact scan avoids reading every
    partition is dynamic partition pruning: the broadcast build side's
    month values are pushed into the scan's PartitionFilters at runtime.
    Plan-gated in tests/test_partitioned_pruning.py (both DPP on this
    query and static pruning for literal predicates). At 100 TB this is
    the difference between scanning 84 months and the 11 hot ones.

    Reference analogue: date-named snapshot dirs scoped by run date
    (unextracted_snapshot.py) — the same layout, maintained by Spark.
    """
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        "o_totalprice",
        "o_orderpriority",
    )
    path = scratch_dir(spark, "orders_by_month", sf_dir)
    write_partitioned(fact, path, "o_month")

    back = read_partitioned(spark, path)
    hot = (
        back.filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 350000))
        .select("o_month")
        .distinct()
    )
    return (
        back.join(F.broadcast(hot), "o_month")
        .groupBy("o_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query("hll_user_rollup_datasketch")
def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-user rollup: per-(event_type, shard) HLL
    sketches, unioned per event_type, against the exact count.

    The scale contract is MERGEABILITY: at 100 TB you never re-scan raw
    events to count distincts across a new grouping — you union the
    16-shard (or per-day, per-run) sketch partials. Emitting both the
    merged-partial estimate and the direct single-pass estimate makes the
    invariant observable: HLL union is lossless over disjoint inputs, so
    the two MUST be equal (contract-gated in
    tests/test_ext_query_contracts.py, with a ±5% error floor vs exact).
    Sketches are Datasketches HLL_4 binaries (Spark built-in
    hll_sketch_agg/hll_union_agg) — JVM-side, map-side combinable, ~1.5 kB
    per group at lgK=12 regardless of cardinality.

    Ext tier: DuckDB's approx_count_distinct rides a different HLL
    implementation, so the estimates aren't cross-engine comparable; the
    exact column is, and the driver's rows-only check plus the contract
    test pin the rest.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type", "user_id", F.pmod(F.col("event_id"), F.lit(16)).alias("shard")
    )
    partials = base.groupBy("event_type", "shard").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("shard_users"),
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_merged"),
        F.sum("shard_users").alias("sum_shard_users"),
    )
    direct = base.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
        .cast("long")
        .alias("est_direct"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    return (
        merged.join(direct, "event_type")
        .select("event_type", "n_exact", "est_merged", "est_direct", "sum_shard_users")
        .orderBy("event_type")
    )


_HLL_XENGINE_ORACLE = """
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hh
  FROM (SELECT DISTINCT event_type, user_id FROM events)
), parts AS (
  SELECT event_type, hh >> 52 AS bucket,
         hh & 4503599627370495 AS suffix
  FROM h
), rho AS (
  SELECT event_type, bucket,
         CASE WHEN suffix = 0 THEN 53
              ELSE 52 - length(bin(suffix)) + 1 END AS r
  FROM parts
), regs AS (
  SELECT event_type, bucket, max(r) AS reg FROM rho GROUP BY event_type, bucket
), agg AS (
  SELECT event_type,
         sum(power(2.0, -reg)) + (256 - count(*)) AS s,
         256 - count(*) AS v,
         count(*) AS n_buckets
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type, n_buckets,
         (0.7213 / (1 + 1.079 / 256)) * 256.0 * 256.0 / s AS e_raw, v
  FROM agg
), corrected AS (
  SELECT event_type, n_buckets,
         CASE WHEN e_raw <= 2.5 * 256 AND v > 0
              THEN 256.0 * ln(256.0 / v) ELSE e_raw END AS e
  FROM est
), exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events
  GROUP BY event_type
)
SELECT c.event_type AS event_type, x.n_exact AS n_exact,
       round(c.e, 4) AS est_hll, CAST(c.n_buckets AS BIGINT) AS n_buckets
FROM corrected c JOIN exact x ON c.event_type = x.event_type
ORDER BY event_type
"""


@query("hll_user_rollup", oracle=_HLL_XENGINE_ORACLE)
def hll_user_rollup_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate, cross-engine oracle form: the
    SKETCH ALGORITHM itself (Flajolet et al. 2007, public) implemented
    as declarative aggregates over the portable md5-prefix hash — bucket
    = top 8 hash bits (m=256), rank = leading-zero count of the 52-bit
    suffix via bin-string length (bit-identical in both engines), max
    per register, harmonic-mean estimate with the standard small-range
    correction. DuckDB replays every step, so the driver value-checks
    the full sketch pipeline — where the production `hll_user_rollup`
    rides Spark's built-in Datasketches HLL_4 (mergeable binary
    sketches; a different implementation than DuckDB's, hence rows-only
    by necessity). The estimate column is the algorithm's own output:
    within ~1.04/sqrt(256) ≈ 6.5% of n_exact in distribution."""
    events = load_table(spark, sf_dir, "events")
    h = (
        events.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type",
            _portable_hash60(F.col("user_id").cast("string")).alias("hh"),
        )
    )
    parts = h.select(
        "event_type",
        F.shiftrightunsigned("hh", 52).alias("bucket"),
        F.expr("hh & 4503599627370495").alias("suffix"),
    )
    rho = parts.select(
        "event_type",
        "bucket",
        F.when(F.col("suffix") == 0, F.lit(53))
        .otherwise(F.lit(52) - F.length(F.bin("suffix")) + 1)
        .alias("r"),
    )
    regs = rho.groupBy("event_type", "bucket").agg(F.max("r").alias("reg"))
    agg = regs.groupBy("event_type").agg(
        (F.sum(F.pow(F.lit(2.0), -F.col("reg"))) + (256 - F.count(F.lit(1)))).alias("s"),
        (256 - F.count(F.lit(1))).alias("v"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    alpha = 0.7213 / (1 + 1.079 / 256)
    est = agg.select(
        "event_type",
        "n_buckets",
        (F.lit(alpha * 256.0 * 256.0) / F.col("s")).alias("e_raw"),
        "v",
    ).select(
        "event_type",
        "n_buckets",
        F.when(
            (F.col("e_raw") <= 2.5 * 256) & (F.col("v") > 0),
            F.lit(256.0) * F.log(F.lit(256.0) / F.col("v")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round("e", 4).alias("est_hll"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
        )
        .orderBy("event_type")
    )


_ZORDER_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_partkey % 1024 AS a, l_suppkey % 1024 AS b,
       CAST(list_sum(list_transform(range(0, 10),
         i -> (((l_partkey % 1024) >> i) & 1) * (1::BIGINT << (2 * i))
            + (((l_suppkey % 1024) >> i) & 1) * (1::BIGINT << (2 * i + 1))))
         AS BIGINT) AS zval
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@query("zorder_curve_assign", oracle=_ZORDER_ORACLE)
def zorder_curve_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order curve assignment over a two-key fact: bit i of the
    first key lands at position 2i, of the second at 2i+1 — ONE sort key
    whose locality covers BOTH dimensions, the layout primitive behind
    `sinks/partitioned.write_zordered` (its row-group skipping effect is
    metadata-gated in tests/test_partitioned_pruning.py::TestZOrderLayout;
    THIS query value-checks the curve arithmetic itself against SQL —
    an unrolled shift/mask/sum, whole-stage codegen, no UDF). The
    multi-dimensional generalization of write_sorted's 1-D range layout,
    which the reference maintains by hand as date-named snapshot dirs
    (unextracted_snapshot.py)."""
    from tlmc_etl_spark.sinks.partitioned import z_value

    li = load_table(spark, sf_dir, "lineitem")
    a = (F.col("l_partkey") % 1024).cast("int")
    b = (F.col("l_suppkey") % 1024).cast("int")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        a.alias("a"),
        b.alias("b"),
        z_value(a, b, bits=10).alias("zval"),
    ).orderBy("l_orderkey", "l_linenumber")
