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


class TestChaosTenKDelta:
    """Round-14 VERDICT #7: the 100x claim wants evidence that recovery
    cost stays PER-BATCH-bounded as the delta grows. A 10k-album journal
    drains as a sequence of byte-bounded micro-batches; a mid-drain kill
    must lose at most the in-flight batch (committed batches never
    replay), and the restarted drain must land the exact full-rebuild
    gold state."""

    def test_mid_drain_kill_recovers_per_batch_bounded_at_10k_albums(
        self, spark, tmp_path
    ):
        import math
        import time

        from pyspark.sql import functions as F

        from tools.bench_incremental import replicated_inputs
        from tlmc_etl_spark.streaming.incremental import (
            rebuild_releases,
            start_incremental_catalog_stream,
        )

        manifest, probe, _ = replicated_inputs(spark, 10_000)
        manifest = manifest.localCheckpoint(eager=True)
        probe = probe.localCheckpoint(eager=True)
        albums = [
            (r["circle_dir"], r["album_dir"])
            for r in manifest.select("circle_dir", "album_dir").distinct().collect()
        ]
        assert len(albums) >= 10_000

        journal = str(tmp_path / "changes.jsonl")
        _append_journal(journal, albums)
        total_bytes = os.path.getsize(journal)
        cap = total_bytes // 5  # ~6 bounded micro-batches
        expected_batches = math.ceil(total_bytes / cap)
        assert expected_batches >= 4

        target = str(tmp_path / "gold")
        ckpt = str(tmp_path / "ckpt")
        commits_dir = os.path.join(ckpt, "commits")

        def n_commits() -> int:
            try:
                return len(
                    [f for f in os.listdir(commits_dir) if not f.startswith(".")]
                )
            except FileNotFoundError:
                return 0

        # run 1: kill mid-drain, after >=2 batches committed but well
        # before the journal is drained
        q = start_incremental_catalog_stream(
            spark, journal, manifest, probe, target, ckpt,
            max_bytes_per_batch=cap,
        )
        deadline = time.time() + 300
        while n_commits() < 2 and time.time() < deadline:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(120)
        commits_run1 = n_commits()
        assert 2 <= commits_run1 < expected_batches, (
            "kill must land mid-drain for the chaos claim to mean anything"
        )

        # run 2 (the recovery): drains the REMAINDER only — committed
        # batches never replay, so new commits are bounded by the
        # remaining batch count plus the one in-flight batch the kill
        # may have torn
        q = start_incremental_catalog_stream(
            spark, journal, manifest, probe, target, ckpt,
            max_bytes_per_batch=cap,
        )
        q.awaitTermination(600)
        new_commits = n_commits() - commits_run1
        assert new_commits <= (expected_batches - commits_run1) + 1, (
            f"recovery replayed committed work: {new_commits} new batches "
            f"for {expected_batches - commits_run1} remaining"
        )

        # and the state is exactly the full rebuild: row-count plus a
        # value checksum over every album (not a sample)
        gold = spark.read.parquet(target).drop("album_key", "__seq", "__epoch")
        want = rebuild_releases(manifest, probe)
        assert gold.count() == len(albums)
        cols = sorted(gold.columns)

        def checksum(df):
            # decimal sum: 10k raw int64 hashes overflow a long sum
            # under ANSI mode
            return (
                df.select(
                    F.xxhash64(*[F.col(c).cast("string") for c in cols])
                    .cast("decimal(38,0)")
                    .alias("h")
                )
                .agg(F.sum("h"))
                .first()[0]
            )

        assert checksum(gold) == checksum(want), (
            "recovered gold diverged from the full rebuild"
        )
