"""Incremental / journal-resume query catalog over the `events` table.

The reference has no true stream processing; its streaming-shaped surface is
journaled exactly-once resume, delta detection and hash sharding
(SURVEY.md §2.9). Those are expressed here as incremental-batch plans; the
real Structured Streaming pieces (file source + AvailableNow + watermark)
live in tlmc_etl_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


@query(
    "journal_resume",
    oracle="""
WITH completed AS (
  SELECT event_id FROM events WHERE event_type IN ('view', 'click') AND event_id % 3 != 0
)
SELECT e.event_id, e.event_type, round(e.value, 4) AS value
FROM events e
ANTI JOIN completed c ON e.event_id = c.event_id
""",
)
def journal_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journal anti-filter: pending work = worklist − completed journal.

    Reference: every resumable stage drops items already in its append-only
    completed journal before doing work (extract.py:47-67,
    normalizer_pass1.py:153-164, hls_runner.py:152-166). Left-anti join,
    UNHINTED: when the journal side is small (a fresh run's journal) AQE
    broadcasts it at runtime; when a long-lived journal approaches the
    worklist's size — as this stand-in's does, ~44% of events — a forced
    broadcast would ship the whole journal to every executor, so the
    shuffled anti-join fallback must stay reachable.
    """
    events = load_table(spark, sf_dir, "events")
    completed = events.filter(
        F.col("event_type").isin("view", "click") & (F.col("event_id") % 3 != 0)
    ).select("event_id")
    return events.join(completed, "event_id", "left_anti").select(
        "event_id", "event_type", F.round("value", 4).alias("value")
    )


@query(
    "delta_detect",
    oracle="""
WITH old AS (
  SELECT event_id, md5(event_type || ':' || CAST(round(value, 4) AS VARCHAR)) AS fingerprint
  FROM events WHERE event_id % 10 != 0
), new AS (
  SELECT event_id,
         md5(event_type || ':' || CAST(round(
            CASE WHEN event_id % 13 = 0 THEN value + 1 ELSE value END, 4) AS VARCHAR)) AS fingerprint
  FROM events WHERE event_id % 7 != 0
)
SELECT event_id, delta_status FROM (
  SELECT coalesce(o.event_id, n.event_id) AS event_id,
         CASE WHEN o.event_id IS NULL THEN 'added'
              WHEN n.event_id IS NULL THEN 'removed'
              WHEN o.fingerprint != n.fingerprint THEN 'changed'
              ELSE 'unchanged' END AS delta_status
  FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
) WHERE delta_status != 'unchanged'
""",
)
def delta_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot delta detection by content hash (full-outer diff join).

    Reference: xxh128 snapshot of every archive; the next release diffs by
    hash and reprocesses only added∪changed (unextracted_snapshot.py:1-9,
    47-70; STEPS.md:142-146). Fingerprints here are md5 so Spark and the
    oracle agree byte-for-byte.
    """
    events = load_table(spark, sf_dir, "events")

    def fingerprint(value_col):
        return F.md5(
            F.concat(F.col("event_type"), F.lit(":"), F.round(value_col, 4).cast("string"))
        )

    old = events.filter(F.col("event_id") % 10 != 0).select(
        F.col("event_id").alias("old_id"), fingerprint(F.col("value")).alias("old_fp")
    )
    new_val = F.when(F.col("event_id") % 13 == 0, F.col("value") + 1).otherwise(F.col("value"))
    new = events.filter(F.col("event_id") % 7 != 0).select(
        F.col("event_id").alias("new_id"), fingerprint(new_val).alias("new_fp")
    )
    joined = old.join(new, old.old_id == new.new_id, "full")
    return joined.select(
        F.coalesce("old_id", "new_id").alias("event_id"),
        F.when(F.col("old_id").isNull(), "added")
        .when(F.col("new_id").isNull(), "removed")
        .when(F.col("old_fp") != F.col("new_fp"), "changed")
        .otherwise("unchanged")
        .alias("delta_status"),
    ).filter(F.col("delta_status") != "unchanged")


@query(
    "hash_shard_assign",
    oracle="""
SELECT shard, count(*) AS n_items, min(event_id) AS min_id, max(event_id) AS max_id
FROM (
  SELECT event_id, (event_id * 2654435761) % 4294967296 % 8 AS shard
  FROM events
) GROUP BY shard
""",
)
def hash_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash shard routing + per-shard stats.

    Reference: blake2b(track_id) % shard_count routes work to machines,
    chosen over `hash()` precisely because it is deterministic across
    processes (hls_runner.py:44-81, shard_math.py:1-33). The shard key here
    is a Knuth multiplicative hash (portable arithmetic, so the DuckDB
    oracle agrees); in production Spark's own `xxhash64` is deterministic
    cluster-wide and is the right choice.
    """
    events = load_table(spark, sf_dir, "events")
    shard = (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296) % 8
    return (
        events.select("event_id", shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


@query(
    "event_lag_gap",
    oracle="""
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
         AS gap_seconds
FROM events
""",
)
def event_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ordered lag: seconds since the user's previous event.

    The reference's journals are time-ordered appends; lag/ordered-window is
    part of the declared t2 surface (SURVEY.md §2.11). Timestamps leave the
    result as epoch-second deltas so the oracle hash is type-stable.
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return events.select("event_id", "user_id", gap.cast("bigint").alias("gap_seconds"))


@query(
    "sessionize_events",
    oracle="""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                   > 3600 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
), s AS (
  SELECT event_id, user_id,
         CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM g
)
SELECT user_id, session_no, count(*) AS n_events
FROM s GROUP BY user_id, session_no
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1h inactivity) via lag + running sum.

    Batch-mode equivalent of a session window; the streaming variant (true
    `session_window` with watermark) lives in streaming/windows.py. Two
    windows over the same (user_id, ts) sort — Spark reuses the single sort.
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = (
        F.when(prev_ts.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 3600), 1)
        .otherwise(0)
    )
    g = events.select("event_id", "user_id", "ts", is_new.alias("is_new_session"))
    s = g.withColumn(
        "session_no",
        F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return s.groupBy("user_id", "session_no").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "copy_binary_export",
    oracle="""
WITH rows AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CASE WHEN o_orderkey % 30 = 0 THEN NULL
              ELSE 'note ' || CAST(o_orderkey AS VARCHAR) END AS note,
         (o_orderkey * 2654435761) % 4294967296 % 8 AS shard
  FROM orders WHERE o_orderkey % 10 = 0
), sized AS (
  SELECT shard,
         2 + (4 + 8) + (4 + strlen(o_orderstatus)) + (4 + 8)
           + (CASE WHEN note IS NULL THEN 4 ELSE 4 + strlen(note) END) AS row_bytes
  FROM rows
)
SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_rows,
       CAST(sum(row_bytes) AS BIGINT) AS payload_bytes,
       CAST(19 + sum(row_bytes) + 2 AS BIGINT) AS file_bytes
FROM sized GROUP BY shard ORDER BY shard
""",
)
def copy_binary_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY BINARY bulk-export: hash-sharded PostgreSQL binary-COPY files
    written by the real sink, value-checked by framing arithmetic.

    The sink (sinks/copybin.py) writes the documented COPY wire format —
    19-byte header, per-row int16 field count + int32 length-prefixed
    big-endian fields (NULL = length -1), int16 -1 trailer — one file per
    multiplicative-hash shard (SimilarTrackProcessor.cs:39-92's load path,
    minus the live connection this environment lacks). The returned stats
    come from the writer itself (actual encoded byte counts), while the
    oracle recomputes them as pure SQL arithmetic over the same rows — so
    any framing drift (wrong width, missed NULL, wrong shard) hash-fails.
    Byte-level decode parity is unit-tested separately.
    """
    from tlmc_etl_spark.scratch import scratch_dir
    from tlmc_etl_spark.sinks.copybin import write_copy_shards

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    rows = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 30 != 0,
            F.concat(F.lit("note "), F.col("o_orderkey").cast("string")),
        ).alias("note"),
    )
    out_dir = scratch_dir(spark, "copybin", sf_dir)
    return write_copy_shards(rows, out_dir, "o_orderkey", n_shards=8).orderBy("shard")


_CACHE_ORACLE = """
WITH req AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey % 10 = 0
)
SELECT 'thwiki___wiki_Album ' || k AS cache_key,
       CASE WHEN k % 3 = 0 AND k % 21 <> 0 THEN 'hit'
            WHEN k % 5 = 0 THEN 'restored'
            ELSE 'miss' END AS status
FROM req ORDER BY cache_key
"""


@query("cached_fetch_accounting", oracle=_CACHE_ORACLE)
def cached_fetch_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized-fetch cache accounting: every requested URL classified
    hit / restored / miss against a bronze cache index + payload store
    (operators/cache.py; Cache.py:24-110, AdvancedCache.py:17-35).

    The request list carries duplicates on purpose (every 10th key twice)
    — fetch-dedup must collapse them before classification, so N
    concurrent requests for one URL cost at most one fetch. The key runs
    through the REAL normalization path (parse_url → url_decode →
    hostile-char substitution, all JVM-side); the oracle rebuilds it from
    the construction arithmetic, so drift in parsing, decoding, or the
    character class hash-fails. Index/store membership arithmetic plants
    all three states, including the carried-over-directory case (file
    present, index row missing → restored, NOT refetched) and the
    dead-index-row case (row present, file gone → miss again).
    """
    from tlmc_etl_spark.operators.cache import cache_key_from_url, cache_resolve

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.concat(
            F.lit("https://wiki.example.org/wiki/Album%20"),
            F.col("o_orderkey").cast("string"),
            F.lit("?action=raw"),
        ).alias("url"),
    )
    requests = base.unionByName(base.filter(F.col("k") % 100 == 0)).select(
        "k", cache_key_from_url("thwiki", F.col("url")).alias("cache_key")
    )
    index = base.filter(F.col("k") % 3 == 0).select(
        cache_key_from_url("thwiki", F.col("url")).alias("cache_key"),
        (F.col("k") % 21 != 0).alias("file_ok"),
    )
    store = base.filter(
        (F.col("k") % 5 == 0) | ((F.col("k") % 3 == 0) & (F.col("k") % 21 != 0))
    ).select(cache_key_from_url("thwiki", F.col("url")).alias("cache_key"))
    return cache_resolve(requests, index, store).orderBy("cache_key")


_RATE_SCHEDULE_ORACLE = """
WITH req AS (
  SELECT o_orderkey AS req_key FROM orders WHERE o_orderkey % 25 = 0
), w AS (
  SELECT req_key,
         CAST(('0x' || substr(md5(req_key::VARCHAR), 1, 15))::BIGINT % 8
              AS INT) AS worker
  FROM req
), s AS (
  SELECT req_key, worker,
         row_number() OVER (PARTITION BY worker ORDER BY req_key) AS seq
  FROM w
)
SELECT req_key, worker, CAST(seq AS INT) AS seq,
       CAST(round((seq - 1) / 2.0, 4) AS DOUBLE) AS scheduled_offset_s
FROM s ORDER BY worker, seq
"""


@query("rate_limit_schedule", oracle=_RATE_SCHEDULE_ORACLE)
def rate_limit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's API rate limiting (`sleep(0.5/1.5)` between calls,
    song_page_scraper.py:142,157) as an engine contract: a DETERMINISTIC
    dispatch plan — worker = portable_hash(key) % 8, per-worker sequence,
    scheduled offset seq/rps at 2 req/s per worker — so the aggregate
    rate is bounded by workers × rps BY CONSTRUCTION and the schedule is
    auditable before any call fires (a sleep buried in a scraper loop is
    neither). Enforcement is operators/ratelimit.py's per-task token
    bucket (`rate_limited`, the LLM-healer/fetch wrapper),
    property-tested with an injected clock in tests/test_ratelimit.py —
    wall-clock pacing is not SQL-expressible, the plan is."""
    from tlmc_etl_spark.operators.ratelimit import dispatch_schedule

    req = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 25 == 0)
        .select(F.col("o_orderkey").alias("req_key"))
    )
    return dispatch_schedule(req, "req_key", n_workers=8, rps_per_worker=2.0).orderBy(
        "worker", "seq"
    )
