"""Relational (t2) catalog, second batch: classifier/heuristic/merge
operators from SURVEY.md §2 not covered by the first batch.
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


@query(
    "hls_ladder_worklist",
    oracle="""
WITH tracks AS (
  SELECT o_orderkey, 'tracks/' || o_orderkey || '.flac' AS src,
         round(least(least(-14.0 - (-1 * o_totalprice / 10000.0), -1.0), 12.0), 4) AS gain_db
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o_orderkey, t.ord AS ordinal, t.br AS bitrate_k, src, gain_db,
       'media/' || o_orderkey || '/' || t.br || 'k.m4s' AS dst,
       'ffmpeg -i ' || src || ' -af volume=' || gain_db || 'dB -b:a ' || t.br || 'k '
         || 'media/' || o_orderkey || '/' || t.br || 'k.m4s' AS cmd
FROM tracks, LATERAL (SELECT unnest([128, 192, 256, 320]) AS br,
                             unnest([0, 1, 2, 3]) AS ord) t
""",
)
def hls_ladder_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcode-worklist synthesis: per track × 4-rung bitrate ladder →
    ordinal, destination path, gain-corrected command string.

    Reference: the HLS assignment stage synthesizes one ffmpeg command per
    track covering all 4 rungs with the measured gain folded in
    (hls_assignment.py:109-169); ordinals ride posexplode
    (AlbumTrackMetadataProcessor.cs:126-139). Pure projection + posexplode —
    embarrassingly parallel at any scale, no shuffle at all.
    """
    orders = load_table(spark, sf_dir, "orders")
    tracks = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.concat(F.lit("tracks/"), F.col("o_orderkey"), F.lit(".flac")).alias("src"),
        F.round(
            F.least(
                F.least(
                    F.lit(-14.0) - (F.col("o_totalprice") * -1 / 10000.0), F.lit(-1.0)
                ),
                F.lit(12.0),
            ),
            4,
        ).alias("gain_db"),
    )
    ladder = tracks.select(
        "o_orderkey",
        "src",
        "gain_db",
        F.posexplode(F.array(F.lit(128), F.lit(192), F.lit(256), F.lit(320))).alias(
            "ordinal", "bitrate_k"
        ),
    )
    dst = F.concat(
        F.lit("media/"), F.col("o_orderkey"), F.lit("/"), F.col("bitrate_k"), F.lit("k.m4s")
    )
    return ladder.select(
        "o_orderkey",
        "ordinal",
        "bitrate_k",
        "src",
        "gain_db",
        dst.alias("dst"),
        F.concat(
            F.lit("ffmpeg -i "),
            F.col("src"),
            F.lit(" -af volume="),
            F.col("gain_db"),
            F.lit("dB -b:a "),
            F.col("bitrate_k"),
            F.lit("k "),
            dst,
        ).alias("cmd"),
    )


@query(
    "hls_master_playlist",
    oracle="""
WITH rungs AS (
  SELECT o_orderkey, t.ord, t.br,
         '#EXT-X-STREAM-INF:BANDWIDTH=' || t.br || '000,AUDIO="audio",CODECS="mp4a.40.2"'
           || chr(10) || 'hls/' || t.br || 'k/playlist.m3u8' AS blk
  FROM orders, LATERAL (SELECT unnest([128, 192, 256, 320]) AS br,
                               unnest([0, 1, 2, 3]) AS ord) t
  WHERE o_orderkey % 100 = 0
)
SELECT o_orderkey,
       '#EXTM3U' || chr(10) || '#EXT-X-VERSION:7' || chr(10)
         || '#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="audio",NAME="Audio",DEFAULT=YES,AUTOSELECT=YES'
         || chr(10) || string_agg(blk, chr(10) ORDER BY ord) AS master_m3u8
FROM rungs GROUP BY o_orderkey
""",
)
def hls_master_playlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Master-playlist TEXT synthesis: the m3u8 document itself, one per
    track, over the 4-rung ladder.

    Reference: generate_master_playlist (hls_finalizer.py:69-81) — fixed
    header, then per quality an EXT-X-STREAM-INF line whose BANDWIDTH is
    the rung's kbit figure with '000' appended, followed by the rung's
    relative playlist path. Pure string algebra over the worklist table
    (hls_ladder_worklist's basis): posexplode + one grouped ordered fold —
    the document column is then a plain text sink write.
    """
    orders = load_table(spark, sf_dir, "orders")
    rungs = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.posexplode(F.array(F.lit(128), F.lit(192), F.lit(256), F.lit(320))).alias(
            "ord", "br"
        ),
    )
    blk = F.concat(
        F.lit('#EXT-X-STREAM-INF:BANDWIDTH='), F.col("br"),
        F.lit('000,AUDIO="audio",CODECS="mp4a.40.2"\nhls/'),
        F.col("br"), F.lit("k/playlist.m3u8"),
    )
    return (
        rungs.withColumn("blk", blk)
        .groupBy("o_orderkey")
        .agg(
            F.concat(
                F.lit("#EXTM3U\n#EXT-X-VERSION:7\n"),
                F.lit('#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="audio",NAME="Audio",DEFAULT=YES,AUTOSELECT=YES\n'),
                F.array_join(
                    F.expr("transform(array_sort(collect_list(struct(ord, blk))), s -> s.blk)"),
                    "\n",
                ),
            ).alias("master_m3u8")
        )
    )


@query(
    "dash_mpd_manifest",
    oracle="""
WITH segs AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS INTEGER) AS dur_s,
         CAST(floor(l_extendedprice) AS BIGINT) % 100000 + 1000 AS seg_len,
         800 + l_orderkey % 100 AS init_len
  FROM lineitem WHERE l_orderkey % 100 = 0
), ranged AS (
  SELECT *,
         init_len + CAST(coalesce(sum(seg_len) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, seg_len, dur_s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS seg_start
  FROM segs
), lines AS (
  SELECT l_orderkey, init_len, sum(dur_s) AS total_s,
         string_agg('            <S d="' || dur_s * 48000 || '"/>', chr(10) ORDER BY l_linenumber, seg_len, dur_s) AS timeline,
         string_agg('          <SegmentURL media="stream.m4s" mediaRange="' || seg_start || '-'
                    || seg_start + seg_len - 1 || '"/>', chr(10) ORDER BY l_linenumber, seg_len, dur_s) AS urls
  FROM ranged GROUP BY l_orderkey, init_len
)
SELECT l_orderkey,
  '<?xml version="1.0" ?>' || chr(10)
  || '<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" profiles="urn:mpeg:dash:profile:isoff-on-demand:2011" type="static" minBufferTime="PT1.5S" mediaPresentationDuration="PT' || total_s || 'S">' || chr(10)
  || '  <Period start="PT0S">' || chr(10)
  || '    <AdaptationSet mimeType="audio/mp4" codecs="mp4a.40.2" startWithSAP="1" segmentAlignment="true" lang="en">' || chr(10)
  || '      <Representation id="320000" bandwidth="320000">' || chr(10)
  || '        <BaseURL>320k/</BaseURL>' || chr(10)
  || '        <SegmentList timescale="48000">' || chr(10)
  || '          <Initialization sourceURL="stream.m4s" range="0-' || init_len - 1 || '"/>' || chr(10)
  || '          <SegmentTimeline>' || chr(10)
  || timeline || chr(10)
  || '          </SegmentTimeline>' || chr(10)
  || urls || chr(10)
  || '        </SegmentList>' || chr(10)
  || '      </Representation>' || chr(10)
  || '    </AdaptationSet>' || chr(10)
  || '  </Period>' || chr(10)
  || '</MPD>' AS mpd
FROM lines
""",
)
def dash_mpd_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DASH MPD TEXT synthesis for the single-file HLS layout: SegmentList
    with an Initialization byte range and one SegmentURL mediaRange per
    segment, all against the same media file.

    Reference: create_mpd (dash-repackage.py:73-154) — SegmentTemplate
    cannot express byte ranges, so single-file maps onto SegmentList; the
    child order (Initialization, SegmentTimeline, SegmentURLs) is fixed by
    the DASH schema; mediaPresentationDuration is the ISO-8601 integer
    seconds (seconds_to_iso_duration, :18-22); timeline entries are
    duration × timescale 48000; ranges are inclusive start-end pairs whose
    starts chain after the init segment (parse_hls_byterange, :27-42).

    Spark shape: segments = lineitems; the byte-range chain is ONE window
    prefix-sum; both ordered folds (timeline, URL list) ride a single
    grouped sort — document assembly is pure whole-stage-codegen string
    algebra, no UDF.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    segs = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("dur_s"),
        (F.col("l_extendedprice").cast("bigint") % 100000 + 1000).alias("seg_len"),
        (F.lit(800) + F.col("l_orderkey") % 100).alias("init_len"),
    )
    # the synthetic lineitem is not tie-free on l_linenumber alone — the
    # fold order must be TOTAL or the two engines disagree on ties
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "seg_len", "dur_s")
    ranged = segs.withColumn(
        "seg_start",
        F.col("init_len")
        + F.coalesce(F.sum("seg_len").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)).cast("bigint"),
    )
    s_line = F.concat(F.lit('            <S d="'), F.col("dur_s") * 48000, F.lit('"/>'))
    url_line = F.concat(
        F.lit('          <SegmentURL media="stream.m4s" mediaRange="'),
        F.col("seg_start"), F.lit("-"), F.col("seg_start") + F.col("seg_len") - 1,
        F.lit('"/>'),
    )
    lines = (
        ranged.withColumn("s_line", s_line)
        .withColumn("url_line", url_line)
        .groupBy("l_orderkey", "init_len")
        .agg(
            F.sum("dur_s").alias("total_s"),
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(l_linenumber, seg_len, dur_s, s_line))), s -> s.s_line)"),
                "\n",
            ).alias("timeline"),
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(l_linenumber, seg_len, dur_s, url_line))), s -> s.url_line)"),
                "\n",
            ).alias("urls"),
        )
    )
    return lines.select(
        "l_orderkey",
        F.concat(
            F.lit('<?xml version="1.0" ?>\n'),
            F.lit('<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" profiles="urn:mpeg:dash:profile:isoff-on-demand:2011" type="static" minBufferTime="PT1.5S" mediaPresentationDuration="PT'),
            F.col("total_s"), F.lit('S">\n'),
            F.lit('  <Period start="PT0S">\n'),
            F.lit('    <AdaptationSet mimeType="audio/mp4" codecs="mp4a.40.2" startWithSAP="1" segmentAlignment="true" lang="en">\n'),
            F.lit('      <Representation id="320000" bandwidth="320000">\n'),
            F.lit('        <BaseURL>320k/</BaseURL>\n'),
            F.lit('        <SegmentList timescale="48000">\n'),
            F.lit('          <Initialization sourceURL="stream.m4s" range="0-'),
            F.col("init_len") - 1, F.lit('"/>\n'),
            F.lit("          <SegmentTimeline>\n"),
            F.col("timeline"), F.lit("\n"),
            F.lit("          </SegmentTimeline>\n"),
            F.col("urls"), F.lit("\n"),
            F.lit("        </SegmentList>\n"),
            F.lit("      </Representation>\n"),
            F.lit("    </AdaptationSet>\n"),
            F.lit("  </Period>\n"),
            F.lit("</MPD>"),
        ).alias("mpd"),
    )


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
    "local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue
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
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
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
