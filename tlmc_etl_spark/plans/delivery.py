"""Media-delivery manifest plans (split from relational2.py, round 8 —
no behavior change): the HLS transcode worklist and the master-
playlist / DASH-MPD manifest writers (SURVEY.md §2.2 sink family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table


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
