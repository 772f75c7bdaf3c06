"""Relational (t2) catalog, second batch: classifier/heuristic/merge
operators from SURVEY.md §2 not covered by the first batch.

Round-8 split (no behavior change): the TPC-H-style fact-table shapes
moved to plans/tpch_shapes.py and the HLS/DASH manifest writers to
plans/delivery.py; this file keeps the catalog-maintenance family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


@query(
    "credit_split_ordinals",
    oracle="""
SELECT p_partkey, t.o AS ordinal, ws[t.o] AS word
FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part),
     LATERAL (SELECT unnest(generate_series(1, len(ws))) AS o) t
""",
)
def credit_split_ordinals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimiter split with preserved ordinals (posexplode).

    Reference: `", "` credit splits keep their order as explicit Ordinal
    columns (AlbumTrackMetadataProcessor.cs:126-139,275-287; SURVEY.md
    §2.6 'Ordinals').
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos0", "word")
    ).select("p_partkey", (F.col("pos0") + 1).alias("ordinal"), "word")


@query(
    "filename_disc_detect",
    oracle="""
WITH files AS (
  SELECT l_orderkey,
         CAST(1 + l_partkey % 3 AS INTEGER)  AS disc,
         CAST(l_linenumber AS INTEGER)       AS trk
  FROM lineitem
), per_disc AS (
  SELECT l_orderkey, disc,
         min(trk) AS min_trk, count(*) AS n_trk, max(trk) AS max_trk
  FROM files GROUP BY l_orderkey, disc
)
SELECT l_orderkey,
       count(*)  AS n_discs,
       (count(*) >= 2
        AND min(disc) = 1
        AND max(disc) = count(*)
        AND bool_and(min_trk = 1)
        AND bool_and(max_trk <= 2 * n_trk)) AS is_disc_encoded
FROM per_disc
GROUP BY l_orderkey
""",
)
def filename_disc_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename-encoded disc/track detection with structural validation.

    Reference: all files match `^(d)[-._ ](t)`; accepted only if the disc
    values form a contiguous 1..N (N≥2) and each disc's track numbers
    start at 1 and stay plausible (max ≤ 2·count) — disc_scanner.py:152-187.
    The validations are pure aggregates: per-disc min/count/max, then
    group-level bool_and — no collect, scales as two partial aggs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    files = li.select(
        "l_orderkey",
        (1 + F.col("l_partkey") % 3).cast("int").alias("disc"),
        F.col("l_linenumber").cast("int").alias("trk"),
    )
    per_disc = files.groupBy("l_orderkey", "disc").agg(
        F.min("trk").alias("min_trk"), F.count(F.lit(1)).alias("n_trk"), F.max("trk").alias("max_trk")
    )
    return per_disc.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_discs"),
        (
            (F.count(F.lit(1)) >= 2)
            & (F.min("disc") == 1)
            & (F.max("disc") == F.count(F.lit(1)))
            & F.bool_and(F.col("min_trk") == 1)
            & F.bool_and(F.col("max_trk") <= 2 * F.col("n_trk"))
        ).alias("is_disc_encoded"),
    )


@query(
    "archive_layout_classify",
    oracle="""
WITH flags AS (
  SELECT l_orderkey,
         bool_or(l_quantity > 25)                                  AS has_audio,
         count(CASE WHEN l_linestatus = 'O' THEN 1 END)            AS n_root_files,
         count(DISTINCT l_suppkey % 5)                             AS n_dirs
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, has_audio, n_root_files, n_dirs,
       CASE WHEN NOT has_audio               THEN 'no_audio'
            WHEN n_dirs <= 1                 THEN 'flat'
            WHEN n_root_files = 0            THEN 'nested'
            ELSE 'bundle' END AS layout
FROM flags
""",
)
def archive_layout_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive layout classification from aggregate structure flags.

    Reference: flat/nested/bundle decided from root-file presence,
    album-like dir count and audio presence per archive
    (extract_plan.py:119-217).
    """
    li = load_table(spark, sf_dir, "lineitem")
    flags = li.groupBy("l_orderkey").agg(
        F.bool_or(F.col("l_quantity") > 25).alias("has_audio"),
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_root_files"),
        F.countDistinct(F.col("l_suppkey") % 5).alias("n_dirs"),
    )
    return flags.select(
        "l_orderkey",
        "has_audio",
        "n_root_files",
        "n_dirs",
        F.when(~F.col("has_audio"), "no_audio")
        .when(F.col("n_dirs") <= 1, "flat")
        .when(F.col("n_root_files") == 0, "nested")
        .otherwise("bundle")
        .alias("layout"),
    )


@query(
    "catalog_convention_heuristic",
    oracle="""
WITH toks AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 4 = 0 THEN upper(p_brand) || '-' || CAST(1000 + p_partkey % 9000 AS VARCHAR)
              WHEN p_partkey % 4 = 1 THEN 'C' || CAST(60 + p_partkey % 40 AS VARCHAR)
              WHEN p_partkey % 4 = 2 THEN 'FLAC+LOG'
              ELSE p_type END AS token
  FROM part
)
SELECT p_partkey, token,
       CASE WHEN regexp_matches(token, '^[A-Z]+-[0-9]{2,}$')
                 AND length(token) BETWEEN 5 AND 15          THEN 'catalog_number'
            WHEN regexp_matches(token, '^C[0-9]{1,3}$')      THEN 'convention'
            WHEN regexp_matches(token, '^[A-Z+]+$')          THEN 'quality_tag'
            ELSE 'other' END AS token_class
FROM toks
""",
)
def catalog_convention_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bracket-token classification: catalog numbers vs conventions vs tags.

    Reference: a bracket token with dash + digits + letters of plausible
    length is a catalog number; a short digit+letter token (minus a
    stoplist) is a convention/event (info_scanner_ph2.py:241-288). Tokens
    are synthesized deterministically from part keys so every class
    appears.
    """
    part = load_table(spark, sf_dir, "part")
    token = (
        F.when(
            F.col("p_partkey") % 4 == 0,
            F.concat(F.upper("p_brand"), F.lit("-"), (1000 + F.col("p_partkey") % 9000).cast("string")),
        )
        .when(F.col("p_partkey") % 4 == 1, F.concat(F.lit("C"), (60 + F.col("p_partkey") % 40).cast("string")))
        .when(F.col("p_partkey") % 4 == 2, F.lit("FLAC+LOG"))
        .otherwise(F.col("p_type"))
    )
    toks = part.select("p_partkey", token.alias("token"))
    return toks.select(
        "p_partkey",
        "token",
        F.when(
            F.col("token").rlike("^[A-Z]+-[0-9]{2,}$") & F.length("token").between(5, 15),
            "catalog_number",
        )
        .when(F.col("token").rlike("^C[0-9]{1,3}$"), "convention")
        .when(F.col("token").rlike("^[A-Z+]+$"), "quality_tag")
        .otherwise("other")
        .alias("token_class"),
    )


@query(
    "cue_confidence_score",
    oracle="""
WITH counts AS (
  SELECT l_orderkey,
         count(CASE WHEN l_quantity < 5 THEN 1 END)                 AS n_cue,
         count(CASE WHEN l_quantity >= 5 THEN 1 END)                AS n_audio,
         count(CASE WHEN l_returnflag = 'R' THEN 1 END)             AS n_embedded
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, n_cue, n_audio,
       round(least(1.0,
             0.6 * least(n_cue, n_audio) / greatest(n_audio, 1)
           + 0.3 * CASE WHEN n_cue > 0 THEN 1.0 ELSE 0.0 END
           + 0.1 * CASE WHEN n_embedded > 0 THEN 1.0 ELSE 0.0 END), 4) AS confidence
FROM counts
""",
)
def cue_confidence_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cue-split confidence ∈ [0,1] from component counts.

    Reference: likelihood an album is an unsplit image rip, computed
    arithmetically from cue/flac/embedded-cuesheet counts
    (cue_scanner.py:26-65).
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(
        F.count(F.when(F.col("l_quantity") < 5, 1)).alias("n_cue"),
        F.count(F.when(F.col("l_quantity") >= 5, 1)).alias("n_audio"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_embedded"),
    )
    conf = F.least(
        F.lit(1.0),
        0.6 * F.least(F.col("n_cue"), F.col("n_audio")) / F.greatest(F.col("n_audio"), F.lit(1))
        + 0.3 * F.when(F.col("n_cue") > 0, 1.0).otherwise(0.0)
        + 0.1 * F.when(F.col("n_embedded") > 0, 1.0).otherwise(0.0),
    )
    return counts.select("l_orderkey", "n_cue", "n_audio", F.round(conf, 4).alias("confidence"))


@query(
    "alias_canonical_fold",
    oracle="""
WITH variants AS (
  SELECT c_custkey, c_name AS spelling, 1 AS root_priority FROM customer
  UNION ALL
  SELECT c_custkey, upper(c_name) AS spelling, 2 AS root_priority
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, c_name || ' ' AS spelling, 3 AS root_priority
  FROM customer WHERE c_custkey % 5 = 0
), keyed AS (
  SELECT lower(trim(spelling)) AS norm_key, spelling, root_priority
  FROM variants
)
SELECT norm_key, spelling AS canonical, n_variants FROM (
  SELECT norm_key, spelling, root_priority,
         count(*) OVER (PARTITION BY norm_key) AS n_variants,
         row_number() OVER (PARTITION BY norm_key
                            ORDER BY root_priority ASC, length(spelling) DESC, spelling ASC) AS rn
  FROM keyed
) WHERE rn = 1
""",
)
def alias_canonical_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-spelling fold: variants group on a normalized key; the
    winner is min(root priority), tie → longest spelling then lexicographic.

    Reference: circle-name variants fold to one canonical spelling with
    exactly this winner rule (build_circle_aliases, extract_plan.py:375-416).
    """
    customer = load_table(spark, sf_dir, "customer")
    v1 = customer.select("c_custkey", F.col("c_name").alias("spelling"), F.lit(1).alias("root_priority"))
    v2 = (
        customer.filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", F.upper("c_name").alias("spelling"), F.lit(2).alias("root_priority"))
    )
    v3 = (
        customer.filter(F.col("c_custkey") % 5 == 0)
        .select("c_custkey", F.concat(F.col("c_name"), F.lit(" ")).alias("spelling"), F.lit(3).alias("root_priority"))
    )
    keyed = v1.unionByName(v2).unionByName(v3).select(
        F.lower(F.trim("spelling")).alias("norm_key"), "spelling", "root_priority"
    )
    w = W.partitionBy("norm_key")
    wo = w.orderBy(F.col("root_priority").asc(), F.length("spelling").desc(), F.col("spelling").asc())
    return (
        keyed.withColumn("n_variants", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select("norm_key", F.col("spelling").alias("canonical"), "n_variants")
    )


@query(
    "merge_upsert",
    oracle="""
WITH target AS (
  SELECT o_orderkey, round(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey % 3 != 0
), staging AS (
  SELECT o_orderkey, round(o_totalprice + 10, 2) AS price
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
       coalesce(s.price, t.price)           AS price,
       CASE WHEN t.o_orderkey IS NULL THEN 'insert'
            WHEN s.o_orderkey IS NULL THEN 'keep'
            ELSE 'update' END               AS action
FROM target t FULL OUTER JOIN staging s ON t.o_orderkey = s.o_orderkey
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (insert new / update matched / keep rest) as a
    full-outer coalesce — the staging+upsert pattern.

    Reference: `\\copy` to temp table then INSERT ON CONFLICT + UPDATE FROM
    in one transaction (apply_artwork_variants.sql:8-58). On Delta this is
    a literal MERGE INTO; the full-outer expression is the engine-portable
    form with identical semantics.
    """
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("t_key"), F.round("o_totalprice", 2).alias("t_price")
    )
    staging = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("s_key"), F.round(F.col("o_totalprice") + 10, 2).alias("s_price")
    )
    j = target.join(staging, target.t_key == staging.s_key, "full")
    return j.select(
        F.coalesce("t_key", "s_key").alias("o_orderkey"),
        F.coalesce("s_price", "t_price").alias("price"),
        F.when(F.col("t_key").isNull(), "insert")
        .when(F.col("s_key").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


@query(
    "pivot_status_counts",
    oracle="""
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per category) — the three-flavor merge's cousin
    expressed as a single groupBy().pivot()."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@query(
    "status_transition",
    oracle="""
WITH wl AS (
  SELECT event_id,
         CASE WHEN event_type IN ('view', 'click') THEN 'PENDING'
              WHEN event_type = 'error'            THEN 'FAILED'
              ELSE 'PROCESSED' END AS status,
         value
  FROM events
)
SELECT event_id, status AS old_status,
       CASE WHEN status = 'PENDING' AND value > 100 THEN 'PROCESSED'
            WHEN status = 'PENDING'                 THEN 'FAILED'
            ELSE status END AS new_status
FROM wl WHERE status = 'PENDING'
""",
)
def status_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrape-state-machine transition: select PENDING work, emit the new
    status column (QueryStatus PENDING→PROCESSED/FAILED,
    QueryModel.py:20-36, song_page_scraper(query).py:126-160)."""
    events = load_table(spark, sf_dir, "events")
    wl = events.select(
        "event_id",
        F.when(F.col("event_type").isin("view", "click"), "PENDING")
        .when(F.col("event_type") == "error", "FAILED")
        .otherwise("PROCESSED")
        .alias("status"),
        "value",
    )
    return wl.filter(F.col("status") == "PENDING").select(
        "event_id",
        F.col("status").alias("old_status"),
        F.when((F.col("status") == "PENDING") & (F.col("value") > 100), "PROCESSED")
        .when(F.col("status") == "PENDING", "FAILED")
        .otherwise(F.col("status"))
        .alias("new_status"),
    )


@query(
    "props_json_extract",
    oracle="""
SELECT k, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM (
  SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k, value
  FROM events
) GROUP BY k
""",
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column + rollup.

    Reference: lists/fields serialized as JSON strings in SQLite cells and
    parsed at use (ThwikiAlbumPageScraper song_page_scraper.py:329-339);
    Spark's from_json/get_json_object keeps the parse JVM-side.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(F.get_json_object("props", "$.k").cast("int").alias("k"), "value")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "stem_collision_rename",
    oracle="""
WITH stems AS (
  SELECT p_partkey, split_part(p_name, ' ', 2) AS stem, p_type,
         count(*) OVER (PARTITION BY split_part(p_name, ' ', 2)) AS n_stem
  FROM part
)
SELECT p_partkey, stem, n_stem,
       CASE WHEN n_stem > 1 THEN stem || ' [' || p_type || ']' ELSE stem END AS out_dir
FROM stems
""",
)
def stem_collision_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-path collision dedup: same-stem outputs get a
    discriminator-suffixed directory.

    Reference: 204 `x.flac`/`x.mp3` same-stem pairs get ` [ext]`-suffixed
    HLS dirs, detected by a count over the stem (hls_assignment.py:213-246).
    Window count + conditional rename — no shuffle beyond the one window
    exchange, and the rename is a pure projection.
    """
    part = load_table(spark, sf_dir, "part")
    stems = part.select(
        "p_partkey",
        F.split("p_name", " ").getItem(1).alias("stem"),
        "p_type",
    ).withColumn("n_stem", F.count(F.lit(1)).over(W.partitionBy("stem")))
    return stems.select(
        "p_partkey",
        "stem",
        "n_stem",
        F.when(
            F.col("n_stem") > 1, F.concat(F.col("stem"), F.lit(" ["), F.col("p_type"), F.lit("]"))
        )
        .otherwise(F.col("stem"))
        .alias("out_dir"),
    )

def _typeid_char_sql(j: int) -> str:
    """SQL expression for TypeID base32 char j (0 = most significant).

    The 128-bit uuid splits into two UBIGINT halves (hi/lo nibble sums);
    char j covers bits [129-5j .. 125-5j] of the 2-bit-left-padded value.
    Chars 0-11 read hi, char 12 reads hi>>1, char 13 straddles the seam
    (hi bit 0 above lo bits 63..60), chars 14-25 read lo.
    """
    s = 125 - 5 * j
    alpha = "'0123456789abcdefghjkmnpqrstvwxyz'"
    if s >= 64:
        return f"substr({alpha}, 1 + CAST((hi >> {s - 64}) & 31 AS INT), 1)"
    if s == 60:
        return (
            f"substr({alpha}, 1 + CAST(((hi & 1) << 4) | ((lo >> 60) & 15) AS INT), 1)"
        )
    return f"substr({alpha}, 1 + CAST((lo >> {s}) & 31 AS INT), 1)"


_TYPEID_ORACLE = f"""
WITH src AS (
  SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h
  FROM orders WHERE o_orderkey % 100 = 0
), halves AS (
  SELECT o_orderkey, h,
    CAST(list_aggregate(list_transform(range(16),
      i -> CAST(strpos('0123456789abcdef', substr(h, CAST(i AS INT) + 1, 1)) - 1 AS UBIGINT)
           * (CAST(1 AS UBIGINT) << CAST(60 - 4 * i AS INT))), 'sum') AS UBIGINT) AS hi,
    CAST(list_aggregate(list_transform(range(16),
      i -> CAST(strpos('0123456789abcdef', substr(h, CAST(i AS INT) + 17, 1)) - 1 AS UBIGINT)
           * (CAST(1 AS UBIGINT) << CAST(60 - 4 * i AS INT))), 'sum') AS UBIGINT) AS lo
  FROM src
)
SELECT o_orderkey, h AS uuid_hex,
       'trk_' || {" || ".join(_typeid_char_sql(j) for j in range(26))} AS type_id
FROM halves ORDER BY o_orderkey
"""


@query("typeid_mint", oracle=_TYPEID_ORACLE)
def typeid_mint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mint API-facing TypeIDs for a key sample: uuid hex (md5 of the
    natural key — engine-agnostic, so both sides derive identical inputs)
    → `trk_` + 26 Crockford-base32 chars (functions/text.typeid_encode;
    api_client.py:27-48).

    The oracle re-implements the encoding from first principles in SQL —
    two UBIGINT nibble-sum halves, bit-sliced into 5-bit groups with the
    single seam char at bits 60-64 — so the wire format is pinned against
    an independent implementation, not a round-trip through itself. Spec
    golden vectors (nil, max, boundary values) are additionally unit-pinned
    in tests/test_functions.py.
    """
    from tlmc_etl_spark.functions.text import typeid_udf

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    with_hex = orders.select(
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string").cast("binary")).alias("uuid_hex"),
    )
    return with_hex.select(
        "o_orderkey", "uuid_hex", typeid_udf("trk")(F.col("uuid_hex")).alias("type_id")
    ).orderBy("o_orderkey")

@query(
    "props_variant_topk",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       count(*) AS n_events,
       CAST(round(sum(value), 4) AS DOUBLE) AS total_value
FROM events
WHERE event_type = 'click'
GROUP BY k
ORDER BY n_events DESC, k
LIMIT 20
""",
)
def props_variant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VariantType: `parse_json` once
    into a binary variant, then `variant_get` path extraction — the
    engine-native upgrade over per-access `get_json_object` string
    re-parsing (props_json_extract is the legacy form). At 100 TB the
    difference is parse-once-per-row vs parse-per-path-per-row, and
    variant binaries columnar-encode. Top-20 rides TakeOrdered, ties
    broken on k so both engines cut identical rows."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "click")
        .select(F.parse_json("props").alias("v"), "value")
        .select(F.variant_get("v", "$.k", "int").alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), "k")
        .limit(20)
    )

@query(
    "table_quality_report",
    oracle="""
SELECT 'o_custkey' AS col,
       count(*) - count(o_custkey)                   AS n_null,
       count(DISTINCT o_custkey)                     AS n_distinct,
       CAST(min(o_custkey) AS VARCHAR)               AS min_value,
       CAST(max(o_custkey) AS VARCHAR)               AS max_value
FROM orders
UNION ALL
SELECT 'o_totalprice',
       count(*) - count(o_totalprice),
       count(DISTINCT o_totalprice),
       CAST(round(min(o_totalprice), 2) AS VARCHAR),
       CAST(round(max(o_totalprice), 2) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus),
       min(o_orderstatus),
       max(o_orderstatus)
FROM orders
""",
)
def table_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality expectations (null count, cardinality,
    bounds) for the orders table — the dbt-test / expectations-report
    shape every ingest pipeline publishes next to the data.

    ONE pass over the table: all per-column aggregates compute in a
    single agg (map-side partials), then unpivot to the report rows via
    a stack() — never one job per column, the difference between 3 and
    N scans when the real table has 300 columns. String-typed bounds so
    heterogeneous columns share one report schema.
    """
    orders = load_table(spark, sf_dir, "orders")
    a = orders.agg(
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("ck_null"),
        F.countDistinct("o_custkey").alias("ck_dist"),
        F.min("o_custkey").cast("string").alias("ck_min"),
        F.max("o_custkey").cast("string").alias("ck_max"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("tp_null"),
        F.countDistinct("o_totalprice").alias("tp_dist"),
        F.round(F.min("o_totalprice"), 2).cast("string").alias("tp_min"),
        F.round(F.max("o_totalprice"), 2).cast("string").alias("tp_max"),
        (F.count(F.lit(1)) - F.count("o_orderstatus")).alias("st_null"),
        F.countDistinct("o_orderstatus").alias("st_dist"),
        F.min("o_orderstatus").alias("st_min"),
        F.max("o_orderstatus").alias("st_max"),
    )
    return a.select(
        F.expr(
            "stack(3,"
            " 'o_custkey', ck_null, ck_dist, ck_min, ck_max,"
            " 'o_totalprice', tp_null, tp_dist, tp_min, tp_max,"
            " 'o_orderstatus', st_null, st_dist, st_min, st_max)"
            " AS (col, n_null, n_distinct, min_value, max_value)"
        )
    )

@query(
    "bracket_spans_udtf",
    oracle="""
WITH src AS (
  SELECT o_orderkey,
         '[' || o_orderstatus || '] ' || o_orderpriority || ' (' || o_orderkey || ')' AS s
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o_orderkey, 0 AS idx, 'square' AS kind, o_orderstatus AS content
FROM src JOIN orders USING (o_orderkey)
UNION ALL
SELECT o_orderkey, 1, 'plain', o_orderpriority FROM src JOIN orders USING (o_orderkey)
UNION ALL
SELECT o_orderkey, 2, 'round', CAST(o_orderkey AS VARCHAR)
FROM src JOIN orders USING (o_orderkey)
""",
)
def bracket_spans_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF in a LATERAL join: each synthesized
    '[status] priority (key)' string explodes to its positionally-
    ordered spans via BracketSpansUDTF — the §2.10 UDTF surface as a
    real `@udtf` (not explode-of-array-UDF). The oracle reconstructs
    the expected rows from the source columns without running the
    parser, so the span semantics are pinned externally."""
    from tlmc_etl_spark.functions.wikitext import BracketSpansUDTF

    spark.udtf.register("bracket_spans", BracketSpansUDTF)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    orders.select(
        "o_orderkey",
        F.concat(
            F.lit("["), "o_orderstatus", F.lit("] "), "o_orderpriority",
            F.lit(" ("), F.col("o_orderkey").cast("string"), F.lit(")"),
        ).alias("s"),
    ).createOrReplaceTempView("__bracket_src")
    return spark.sql(
        "SELECT o_orderkey, t.idx, t.kind, t.content "
        "FROM __bracket_src, LATERAL bracket_spans(s) t"
    )
