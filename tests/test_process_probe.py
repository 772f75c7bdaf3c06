"""The subprocess probe path, executed for real: tools/fake_ffprobe spawns
as an actual child process under mapInPandas, and every failure mode
(bad exit, missing file, garbage stdout, hang) must land in its own row
while the batch survives — the binvec per-row isolation contract applied
to process UDFs (info_scanner_ph1.py:550-616 semantics).
"""

from __future__ import annotations

import os
import sys

import pytest

from tlmc_etl_spark.operators.process import probe_media_paths

FAKE_FFPROBE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "fake_ffprobe"
)
CMD = [sys.executable, FAKE_FFPROBE, "-v", "error", "-of", "json"]


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "good1.flac").write_bytes(b"x" * 4000)
    (d / "good2.mp3").write_bytes(b"y" * 2500)
    (d / "broken.flac").write_bytes(b"CORRUPT" + b"z" * 100)
    (d / "garbage.flac").write_bytes(b"NOTJSON" + b"z" * 100)
    return d


def _paths_df(spark, d, names):
    return spark.createDataFrame([(str(d / n),) for n in names], "path string")


def test_probe_success_rows_parse_real_child_json(spark, media_dir):
    rows = {
        os.path.basename(r["path"]): r
        for r in probe_media_paths(
            _paths_df(spark, media_dir, ["good1.flac", "good2.mp3"]), probe_cmd=CMD
        ).collect()
    }
    g1 = rows["good1.flac"]
    assert g1["ok"] and g1["reason"] is None
    assert g1["duration_s"] == pytest.approx(4.0)
    assert g1["codec"] == "flac" and g1["sample_rate"] == 44100 and g1["channels"] == 2
    assert rows["good2.mp3"]["codec"] == "mp3"
    assert rows["good2.mp3"]["duration_s"] == pytest.approx(2.5)


def test_bad_exit_missing_file_and_bad_json_fail_their_own_rows(spark, media_dir):
    names = ["good1.flac", "broken.flac", "garbage.flac", "does_not_exist.flac"]
    rows = {
        os.path.basename(r["path"]): r
        for r in probe_media_paths(
            _paths_df(spark, media_dir, names), probe_cmd=CMD
        ).collect()
    }
    assert len(rows) == 4, "every input row must come back, failed or not"
    assert rows["good1.flac"]["ok"]
    assert not rows["broken.flac"]["ok"] and rows["broken.flac"]["reason"] == "exit_1"
    assert not rows["does_not_exist.flac"]["ok"]
    assert rows["does_not_exist.flac"]["reason"] == "exit_2"
    assert not rows["garbage.flac"]["ok"] and rows["garbage.flac"]["reason"] == "bad_json"


def test_hung_probe_times_out_its_row_only(spark, media_dir):
    (media_dir / "hang.flac").write_bytes(b"SLEEP" + b"z" * 10)
    rows = {
        os.path.basename(r["path"]): r
        for r in probe_media_paths(
            _paths_df(spark, media_dir, ["hang.flac", "good1.flac"]),
            probe_cmd=CMD,
            timeout_s=2.0,
        ).collect()
    }
    assert not rows["hang.flac"]["ok"] and rows["hang.flac"]["reason"] == "timeout"
    assert rows["good1.flac"]["ok"], "timeout must not poison the batch"


def test_journal_resume_skips_done_paths_before_spawning(spark, media_dir):
    names = ["good1.flac", "good2.mp3"]
    done = spark.createDataFrame([(str(media_dir / "good1.flac"),)], "path string")
    got = probe_media_paths(
        _paths_df(spark, media_dir, names), probe_cmd=CMD, done=done
    ).collect()
    assert [os.path.basename(r["path"]) for r in got] == ["good2.mp3"]


def test_spawn_error_isolated_when_probe_binary_missing(spark, media_dir):
    rows = probe_media_paths(
        _paths_df(spark, media_dir, ["good1.flac"]),
        probe_cmd=["/nonexistent/ffprobe"],
    ).collect()
    assert len(rows) == 1
    assert not rows[0]["ok"]
    assert rows[0]["reason"].startswith("spawn_error:")


class TestArchiveIndexScan:
    """`7z l -slt` spawned for real via tools/fake_7z; the parse is the
    reference's exact algorithm and unreadable archives isolate."""

    FAKE_7Z = [
        sys.executable,
        os.path.join(os.path.dirname(FAKE_FFPROBE), "fake_7z"),
        "l",
        "-slt",
    ]

    def test_slt_parse_matches_reference_semantics(self):
        from tlmc_etl_spark.operators.archive import parse_slt

        out = (
            b"7-Zip fake\nListing\n\n----------\n"
            b"Path = Disc 1\\01 track.flac\nAttributes = A\n\n"
            b"Path = Scans/\nAttributes = D\n\n"
        )
        assert parse_slt(out) == [("Disc 1/01 track.flac", False), ("Scans", True)]
        assert parse_slt(b"garbage with no separator") is None

    def test_entries_explode_and_bad_archive_isolates(self, spark, tmp_path):
        from tlmc_etl_spark.operators.archive import list_archives

        good = tmp_path / "good.7z"
        good.write_text("D|Album X\nA|Album X/01.flac\nA|root.txt")
        bad = tmp_path / "bad.7z"
        bad.write_bytes(b"CORRUPT whatever")
        df = spark.createDataFrame([(str(good),), (str(bad),)], "path string")
        rows = list_archives(df, list_cmd=self.FAKE_7Z).collect()
        by_archive = {}
        for r in rows:
            by_archive.setdefault(os.path.basename(r["archive"]), []).append(r)
        g = by_archive["good.7z"]
        assert sorted((r["entry"], r["is_dir"]) for r in g) == [
            ("Album X", True),
            ("Album X/01.flac", False),
            ("root.txt", False),
        ]
        assert all(r["ok"] for r in g)
        b = by_archive["bad.7z"]
        assert len(b) == 1 and not b[0]["ok"] and b[0]["reason"] == "exit_2"
