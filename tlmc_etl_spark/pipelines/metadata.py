"""The metadata pipeline: file manifest + probe results → catalog gold
tables, as ONE composed DataFrame program.

This is the reference's batch lifecycle (SURVEY.md §3.1 — disc_scanner →
info_scanner ph1/ph2/ph3 → id_assign_and_merge) re-expressed as the
medallion flow of SURVEY.md §7.1/7.2 slice 0+3: every stage below is a
pure DataFrame→DataFrame function, so the whole pipeline is a single
Catalyst plan per output table — no intermediate JSON artifacts, no OS
process boundaries, resumable by construction (outputs are deterministic
functions of inputs; ids are xxhash64 of natural keys, not uuid7, per
SURVEY.md §7.4-1).

Human-in-the-loop stages become `needs_review` flag columns joined back in
(SURVEY.md §7.4-3), never blocking prompts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.functions.text import (
    extract_brackets_pandas,
    parse_track_filename,
    remove_brackets_udf,
    stable_id,
    uuid7_hex,
)
from tlmc_etl_spark.operators.windows import gap_fill_numbers
from tlmc_etl_spark.sources.manifest import AUDIO_EXTS

# --------------------------------------------------------------------------
# Stage 1 — disc classification (disc_scanner.py:40-149 rule families)
# --------------------------------------------------------------------------

DISC_INDEX_RE = r"(?i)^(?:disc|disk|cd|dvd)[-._ ]*([0-9]+)$"
BARE_INDEX_RE = r"^([0-9]{1,2})$"
BONUS_RE = r"(?i)(bonus|extra|omake|offvocal|off vocal|instrumental)"
ASSET_DIR_RE = r"(?i)^(scans?|artwork|booklet|bk|jacket)$"
VETO_RE = r"(?i)(stems?|daw|project files?|sessions?)"


def classify_dirs(manifest: DataFrame) -> DataFrame:
    """Per (album, rel_dir): ordered first-match classification.

    Pure CASE-WHEN-rlike cascade (whole-stage codegen; the reference
    measured 97.65% on this rule order — veto > asset > disc-index >
    bonus > bare-index > unknown)."""
    dirs = manifest.select("circle_dir", "album_dir", "rel_dir").distinct()
    # selectExpr SQL, one parse call instead of ~30 py4j round-trips of
    # when-chain construction per catalog build. Safe here because none
    # of these five regexes contain backslashes or quotes (SQL string
    # literal escaping would otherwise mangle them — the date regexes in
    # vote_albums stay on the Column API for exactly that reason).
    for pat in (VETO_RE, ASSET_DIR_RE, DISC_INDEX_RE, BONUS_RE, BARE_INDEX_RE):
        assert "\\" not in pat and "'" not in pat, pat
    d = "coalesce(rel_dir, '')"
    return dirs.selectExpr(
        "circle_dir",
        "album_dir",
        "rel_dir",
        f"CASE WHEN {d} = '' THEN 'main' "
        f"WHEN {d} RLIKE '{VETO_RE}' THEN 'veto' "
        f"WHEN {d} RLIKE '{ASSET_DIR_RE}' THEN 'asset_dir' "
        f"WHEN {d} RLIKE '{DISC_INDEX_RE}' THEN 'disc_index' "
        f"WHEN {d} RLIKE '{BONUS_RE}' THEN 'bonus' "
        f"WHEN {d} RLIKE '{BARE_INDEX_RE}' THEN 'bare_index' "
        f"ELSE 'unknown' END AS dir_class",
        f"CASE WHEN {d} RLIKE '{DISC_INDEX_RE}' "
        f"THEN CAST(regexp_extract({d}, '{DISC_INDEX_RE}', 1) AS INT) "
        f"WHEN {d} RLIKE '{BARE_INDEX_RE}' "
        f"THEN CAST(regexp_extract({d}, '{BARE_INDEX_RE}', 1) AS INT) "
        f"END AS parsed_disc_no",
    )


def resolve_disc_numbers(classified: DataFrame) -> DataFrame:
    """Disc-number resolution (disc_auto_classify.py:102-147): parsed
    indexes win; remaining audio dirs fill gaps by sorted position; albums
    whose resolved set is not contiguous 1..N get a review flag."""
    audio_dirs = classified.filter(
        F.col("dir_class").isin("main", "disc_index", "bare_index", "bonus", "unknown")
    )
    with_number = gap_fill_numbers(
        # one select, not chained withColumns: each withColumn re-analyzes
        # the upstream plan (driver cost ∝ plan size per call)
        audio_dirs.select(
            "*",
            F.col("parsed_disc_no").isNotNull().alias("has_parsed"),
            F.coalesce("parsed_disc_no", F.lit(0)).alias("parsed_or_zero"),
        ),
        group_cols=["circle_dir", "album_dir"],
        number_col="parsed_or_zero",
        valid_col="has_parsed",
        order_cols=["rel_dir"],
        out_col="disc_number",
    ).drop("has_parsed", "parsed_or_zero")
    # contiguity audit: resolved numbers must be exactly 1..N. As a window
    # over the SAME group keys, not a groupBy + join-back: the join form
    # put the whole gap-fill subtree into the plan twice (once as the
    # audit's input, once as the join's left side) and paid an extra
    # aggregation exchange; the window computes the identical per-group
    # booleans in one pass. collect_set stands in for countDistinct
    # (disallowed in windows); its state is bounded by discs-per-album.
    # one F.expr for the whole audit (4 window functions): the Column-API
    # form was ~40 py4j round-trips of plan-construction per catalog
    # build; the SQL string parses JVM-side in one. Same default
    # whole-partition frame (no ORDER BY), same booleans.
    p = "PARTITION BY circle_dir, album_dir"
    return with_number.select(
        "*",
        F.expr(
            f"(min(disc_number) OVER ({p}) = 1) AND "
            f"(max(disc_number) OVER ({p}) = count(1) OVER ({p})) AND "
            f"(size(collect_set(disc_number) OVER ({p})) = count(1) OVER ({p}))"
        ).alias("discs_contiguous"),
    )


# --------------------------------------------------------------------------
# Stage 2 — track parse + probe join (info_scanner ph1/ph2)
# --------------------------------------------------------------------------


def parse_tracks(manifest: DataFrame, probe: DataFrame) -> DataFrame:
    """Audio rows → parsed metadata, probe-tag coalesce, review flags.

    Probe join is LEFT (a missing/unreadable probe is a review flag, not a
    failure — 40/164k in the reference corpus, info_scanner_ph2.py:138-170).
    Precedence: filename parse, then probe tags, then basename fallback
    (info_scanner_ph3.py:50-57).
    """
    audio = manifest.filter(F.lower(F.col("ext")).isin(AUDIO_EXTS))
    parsed = audio.withColumn("fp", parse_track_filename("filename"))
    j = parsed.join(probe, "path", "left")
    tag_no = F.regexp_extract(F.col("tags.track"), r"^(\d+)", 1).cast("int")
    return j.select(
        "path",
        "circle_dir",
        "album_dir",
        "rel_dir",
        "filename",
        F.coalesce(F.col("fp.track_no"), tag_no).alias("track_no_raw"),
        F.coalesce(
            F.col("fp.title"),
            F.col("tags.title"),
            remove_brackets_udf(F.regexp_replace("filename", r"\.[A-Za-z0-9]+$", "")),
        ).alias("title"),
        F.coalesce(F.col("fp.artist"), F.col("tags.artist")).alias("artist"),
        F.col("duration_s"),
        F.col("duration_s").isNull().alias("probe_missing"),
    )


# --------------------------------------------------------------------------
# Stage 3 — album-level extraction + majority vote (info_scanner_ph2)
# --------------------------------------------------------------------------

ALBUM_DATE_RE = r"^(\d{4})\.(\d{2}|xx)\.(\d{2}|xx)"
CATALOG_RE = r"^[A-Z]+-[0-9]{2,}$"
CONVENTION_RE = r"^(?:C|RTS|M3-)[0-9]{1,3}$"


def vote_albums(tracks: DataFrame) -> DataFrame:
    """Album dimension: date from the directory name (wildcard-tolerant),
    catalog/convention from bracket tokens, artist by majority vote over
    track artists (mode with value-ascending tie break)."""
    albums = tracks.select("circle_dir", "album_dir").distinct()
    toks = albums.withColumn("brackets", extract_brackets_pandas()("album_dir"))
    year = F.regexp_extract("album_dir", ALBUM_DATE_RE, 1)
    month = F.regexp_extract("album_dir", ALBUM_DATE_RE, 2)
    day = F.regexp_extract("album_dir", ALBUM_DATE_RE, 3)
    info = toks.select(
        "circle_dir",
        "album_dir",
        F.when(year == "", None).otherwise(year).cast("int").alias("release_year"),
        F.when((month == "") | (month == "xx"), None).otherwise(month).cast("int").alias("release_month"),
        F.when((day == "") | (day == "xx"), None).otherwise(day).cast("int").alias("release_day"),
        F.filter(F.col("brackets"), lambda b: b.rlike(CATALOG_RE)).getItem(0).alias("catalog_number"),
        F.filter(F.col("brackets"), lambda b: b.rlike(CONVENTION_RE)).getItem(0).alias("convention"),
        remove_brackets_udf(F.regexp_replace("album_dir", ALBUM_DATE_RE, "")).alias("album_name"),
    )
    artist_counts = (
        tracks.filter(F.col("artist").isNotNull())
        .groupBy("circle_dir", "album_dir", "artist")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("circle_dir", "album_dir").orderBy(F.col("cnt").desc(), F.col("artist").asc())
    mode_artist = (
        artist_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("circle_dir", "album_dir", F.col("artist").alias("album_artist"))
    )
    return info.join(mode_artist, ["circle_dir", "album_dir"], "left")


# --------------------------------------------------------------------------
# Stage 4 — renumber + ids + gold assembly (info_scanner_ph3 +
# id_assign_and_merge)
# --------------------------------------------------------------------------


@dataclass
class CatalogTables:
    release: DataFrame
    disc: DataFrame
    track: DataFrame


def build_catalog(
    manifest: DataFrame,
    probe: DataFrame,
    id_mode: str = "deterministic",
    mint_ts_ms: int = 0,
) -> CatalogTables:
    """Full pipeline composition → gold release/disc/track tables.

    `id_mode` selects the id minting strategy (SURVEY §7.2-3):
    "deterministic" (default) = xxhash64-hex of the natural key, the
    oracle-replayable form; "uuid7" = production parity with the
    reference's uuid7 ids (id_assign_and_merge.py:74-83) — RFC-9562
    uuid7-format hex with the run's `mint_ts_ms` as the sortable 48-bit
    prefix and hash-derived entropy, so reruns of the same mint stay
    idempotent while downstream B-trees / TypeIDs see real uuid7s. The
    mode changes ID FORMAT ONLY: row content and referential joins are
    identical (tests/test_metadata_pipeline.py pins join-back parity).
    """
    if id_mode == "uuid7":
        def mint_id(*cols):
            return uuid7_hex(mint_ts_ms, *cols)
    elif id_mode == "deterministic":
        mint_id = stable_id
    else:
        raise ValueError(f"unknown id_mode: {id_mode!r}")
    discs = resolve_disc_numbers(classify_dirs(manifest))
    tracks = parse_tracks(manifest, probe)
    albums = vote_albums(tracks)

    # attach disc numbers (left join on the directory identity)
    t_discs = tracks.join(
        discs.select("circle_dir", "album_dir", "rel_dir", "disc_number", "discs_contiguous"),
        ["circle_dir", "album_dir", "rel_dir"],
        "left",
    ).withColumn("disc_number", F.coalesce("disc_number", F.lit(1)))

    # gap-fill track numbers per disc, basename order
    numbered = gap_fill_numbers(
        t_discs.select(
            "*",
            (F.col("track_no_raw").isNotNull() & (F.col("track_no_raw") > 0)).alias(
                "valid_no"
            ),
            F.coalesce("track_no_raw", F.lit(0)).alias("no_or_zero"),
        ),
        group_cols=["circle_dir", "album_dir", "disc_number"],
        number_col="no_or_zero",
        valid_col="valid_no",
        order_cols=["filename"],
        out_col="track_number",
    ).drop("valid_no", "no_or_zero")

    release_id = mint_id("circle_dir", "album_dir")
    track_rows = numbered.select(
        mint_id("path").alias("track_id"),
        release_id.alias("release_id"),
        "disc_number",
        "track_number",
        "title",
        "artist",
        "path",
        "probe_missing",
        F.col("duration_s"),
    )

    release_rows = (
        albums.join(
            numbered.groupBy("circle_dir", "album_dir").agg(
                F.countDistinct("disc_number").alias("disc_count"),
                F.count(F.lit(1)).alias("track_count"),
                F.bool_or(F.col("probe_missing")).alias("any_probe_missing"),
                F.bool_and(F.coalesce(F.col("discs_contiguous"), F.lit(True))).alias("discs_ok"),
            ),
            ["circle_dir", "album_dir"],
        )
        .select(
            mint_id("circle_dir", "album_dir").alias("release_id"),
            mint_id("circle_dir").alias("circle_id"),
            "circle_dir",
            "album_dir",
            F.col("album_name"),
            "release_year",
            "release_month",
            "release_day",
            "catalog_number",
            "convention",
            "album_artist",
            "disc_count",
            "track_count",
            F.array_compact(
                F.array(
                    F.when(F.col("any_probe_missing"), F.lit("probe_missing")),
                    F.when(~F.col("discs_ok"), F.lit("discs_not_contiguous")),
                    F.when(F.col("release_year").isNull(), F.lit("no_release_date")),
                )
            ).alias("needs_review_reasons"),
        )
    )

    disc_rows = (
        numbered.groupBy("circle_dir", "album_dir", "disc_number")
        .agg(F.count(F.lit(1)).alias("track_count"), F.round(F.sum("duration_s"), 3).alias("total_duration_s"))
        .select(
            mint_id("circle_dir", "album_dir", "disc_number").alias("disc_id"),
            mint_id("circle_dir", "album_dir").alias("release_id"),
            "disc_number",
            "track_count",
            "total_duration_s",
        )
    )

    return CatalogTables(release=release_rows, disc=disc_rows, track=track_rows)
