"""End-to-end metadata pipeline tests: invariants the reference enforces
(SURVEY.md §5) — unique gap-filled numbering, deterministic ids across
reruns, review flags instead of failures, disc resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.sources.synthetic import dataframes
from tlmc_etl_spark.pipelines.metadata import build_catalog, classify_dirs, resolve_disc_numbers


@pytest.fixture(scope="module")
def catalog(spark):
    manifest, probe = dataframes(spark, seed=42, n_albums=12)
    cat = build_catalog(manifest, probe)
    # materialize once — every test re-reads the same three tables
    cat.release.cache().count()
    cat.disc.cache().count()
    cat.track.cache().count()
    return cat


class TestTrackNumbering:
    def test_unique_within_disc(self, catalog):
        dupes = (
            catalog.track.groupBy("release_id", "disc_number", "track_number")
            .count()
            .filter("count > 1")
        )
        assert dupes.count() == 0

    def test_canonical_numbers_preserved(self, catalog):
        # every canonically-named file "(NN) [artist] title" keeps NN
        rows = catalog.track.filter(F.col("path").rlike(r"\(\d{2}\) \[")).collect()
        assert rows
        for r in rows:
            import re

            nn = int(re.search(r"\((\d{2})\)", r["path"]).group(1))
            assert r["track_number"] == nn, r["path"]

    def test_all_tracks_numbered_positive(self, catalog):
        assert catalog.track.filter(F.col("track_number") < 1).count() == 0


class TestDiscResolution:
    def test_parsed_disc_indexes_win(self, spark):
        manifest, _ = dataframes(spark, seed=42, n_albums=12)
        discs = resolve_disc_numbers(classify_dirs(manifest))
        cd2 = discs.filter(F.col("rel_dir") == "CD2").collect()
        assert cd2 and all(r["disc_number"] == 2 for r in cd2)

    def test_asset_dirs_not_discs(self, spark):
        manifest, _ = dataframes(spark, seed=42, n_albums=12)
        classified = classify_dirs(manifest)
        scans = classified.filter(F.col("rel_dir") == "Scans").collect()
        assert scans and all(r["dir_class"] == "asset_dir" for r in scans)


class TestAlbumDimension:
    def test_wildcard_dates_parse_year_month_only(self, catalog):
        wild = catalog.release.filter(F.col("album_dir").rlike(r"\.xx ")).collect()
        assert wild
        for r in wild:
            assert r["release_year"] is not None
            assert r["release_day"] is None

    def test_missing_date_flagged(self, catalog):
        flagged = catalog.release.filter(
            F.array_contains("needs_review_reasons", "no_release_date")
        )
        assert flagged.count() >= 1

    def test_catalog_and_convention_extracted(self, catalog):
        rows = catalog.release.collect()
        assert all(r["catalog_number"] and r["catalog_number"].startswith("ABC-") for r in rows)
        assert all(r["convention"] in ("C80", "C97", "RTS8") for r in rows)

    def test_counts_consistent(self, catalog):
        joined = (
            catalog.track.groupBy("release_id")
            .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("disc_number").alias("d"))
            .join(catalog.release, "release_id")
        )
        bad = joined.filter((F.col("n") != F.col("track_count")) | (F.col("d") != F.col("disc_count")))
        assert bad.count() == 0


class TestDeterminism:
    def test_ids_stable_across_reruns(self, spark, catalog):
        manifest, probe = dataframes(spark, seed=42, n_albums=12)
        again = build_catalog(manifest, probe)
        a = {r["track_id"]: r["track_number"] for r in catalog.track.collect()}
        b = {r["track_id"]: r["track_number"] for r in again.track.collect()}
        assert a == b

    def test_release_and_disc_ids_join(self, catalog):
        orphans = catalog.disc.join(catalog.release, "release_id", "left_anti")
        assert orphans.count() == 0
        orphan_tracks = catalog.track.join(catalog.release, "release_id", "left_anti")
        assert orphan_tracks.count() == 0


class TestUuid7IdMode:
    """SURVEY §7.2-3: a uuid7-format production id mode (the reference
    mints uuid7, id_assign_and_merge.py:74-83) that changes ID FORMAT
    ONLY — row content and referential joins must match the default
    deterministic mode exactly."""

    MINT_MS = 1_755_216_000_000  # 2025-08-15T00:00:00Z

    @pytest.fixture(scope="class")
    def both(self, spark):
        manifest, probe = dataframes(spark, seed=42, n_albums=12)
        det = build_catalog(manifest, probe)
        u7 = build_catalog(manifest, probe, id_mode="uuid7", mint_ts_ms=self.MINT_MS)
        return det, u7

    def test_uuid7_wire_format(self, both):
        _, u7 = both
        ids = [r["release_id"] for r in u7.release.collect()] + [
            r["track_id"] for r in u7.track.collect()
        ]
        assert ids
        import uuid as _uuid

        for h in ids:
            assert len(h) == 32
            u = _uuid.UUID(hex=h)
            assert u.version == 7
            assert u.variant == _uuid.RFC_4122
            # 48-bit sortable prefix is the run's mint time
            assert int(h[:12], 16) == self.MINT_MS

    def test_typeid_roundtrip_on_uuid7(self, both):
        from tlmc_etl_spark.functions.text import typeid_decode, typeid_encode

        _, u7 = both
        h = u7.track.select("track_id").first()["track_id"]
        tid = typeid_encode(h, "trk")
        assert typeid_decode(tid) == ("trk", h)

    def test_mode_changes_format_not_content(self, both):
        det, u7 = both
        # content parity: strip every id column, compare the remaining rows
        id_cols = {"release_id", "circle_id", "disc_id", "track_id"}
        for name in ("release", "disc", "track"):
            a = getattr(det, name)
            b = getattr(u7, name)
            keep = [c for c in a.columns if c not in id_cols]
            assert sorted(map(tuple, a.select(keep).collect())) == sorted(
                map(tuple, b.select(keep).collect())
            )

    def test_referential_joins_identical(self, both):
        det, u7 = both
        # join-back parity: the (release content, disc content) pairs the
        # FK graph produces are mode-independent even though the key
        # values differ
        def pairs(cat):
            d = cat.disc.select(
                "release_id", "disc_number",
                F.col("track_count").alias("disc_track_count"),
            )
            j = d.join(cat.release, "release_id").select(
                "circle_dir", "album_dir", "disc_number", "disc_track_count"
            )
            return sorted(map(tuple, j.collect()))

        assert pairs(det) == pairs(u7)

    def test_uuid7_rerun_idempotent(self, spark, both):
        _, u7 = both
        manifest, probe = dataframes(spark, seed=42, n_albums=12)
        again = build_catalog(
            manifest, probe, id_mode="uuid7", mint_ts_ms=self.MINT_MS
        )
        assert sorted(r["track_id"] for r in u7.track.collect()) == sorted(
            r["track_id"] for r in again.track.collect()
        )
