"""The composed AvailableNow incremental job: journal_tail → per-batch
catalog rebuild → keyed gold merge, gated on the stream-≡-batch
invariant across a mid-stream restart (the incremental stream must be
indistinguishable from a one-shot full rebuild — the streaming edition
of catalog_incremental_rebuild's incremental≡full oracle)."""

from __future__ import annotations

import json
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures", "metadata")


@pytest.fixture(scope="module")
def catalog_inputs(spark):
    manifest = spark.read.parquet(os.path.join(FIXTURES, "manifest.parquet"))
    probe = spark.read.parquet(os.path.join(FIXTURES, "probe.parquet"))
    albums = [
        (r["circle_dir"], r["album_dir"])
        for r in manifest.select("circle_dir", "album_dir").distinct().collect()
    ]
    return manifest, probe, sorted(albums)


def _append_journal(path, albums):
    with open(path, "a") as fh:
        for circle, album in albums:
            fh.write(json.dumps({"circle_dir": circle, "album_dir": album}) + "\n")


def _gold_rows(spark, target):
    rows = spark.read.parquet(target).drop("album_key", "__seq", "__epoch")
    return sorted(
        (tuple(r) for r in rows.collect()),
        key=lambda t: (t[0], t[1]),
    )


class TestIncrementalCatalogStream:
    def test_stream_rebuild_matches_full_batch_across_restart(
        self, spark, catalog_inputs, tmp_path
    ):
        from tlmc_etl_spark.streaming.incremental import (
            rebuild_releases,
            start_incremental_catalog_stream,
        )

        manifest, probe, albums = catalog_inputs
        journal = str(tmp_path / "changes.jsonl")
        target = str(tmp_path / "gold")
        ckpt = str(tmp_path / "ckpt")
        open(journal, "w").close()

        # run 1: first half of the albums arrives
        half = len(albums) // 2
        _append_journal(journal, albums[:half])
        q = start_incremental_catalog_stream(
            spark, journal, manifest, probe, target, ckpt
        )
        q.awaitTermination(180)
        got = _gold_rows(spark, target)
        assert len(got) == half

        from pyspark.sql import functions as F

        keys = ["circle_dir", "album_dir"]
        first_half_df = spark.createDataFrame(albums[:half], keys)
        want_half = sorted(
            (
                tuple(r)
                for r in rebuild_releases(
                    manifest.join(F.broadcast(first_half_df), keys, "left_semi"),
                    probe,
                ).collect()
            ),
            key=lambda t: (t[0], t[1]),
        )
        assert got == want_half

        # run 2 (the restart): remaining albums + a re-touch of an already
        # merged one — the re-touch must upsert, not duplicate
        _append_journal(journal, albums[half:] + [albums[0]])
        q = start_incremental_catalog_stream(
            spark, journal, manifest, probe, target, ckpt
        )
        q.awaitTermination(180)
        got = _gold_rows(spark, target)
        want_full = sorted(
            (tuple(r) for r in rebuild_releases(manifest, probe).collect()),
            key=lambda t: (t[0], t[1]),
        )
        assert got == want_full, "incremental stream diverged from full rebuild"

        # run 3: nothing new appended — the drained journal is a no-op
        q = start_incremental_catalog_stream(
            spark, journal, manifest, probe, target, ckpt
        )
        q.awaitTermination(180)
        assert _gold_rows(spark, target) == want_full
