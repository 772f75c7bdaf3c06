"""The ebur128 loudness stage, executed for real: tools/fake_ffmpeg spawns
as an actual child process under mapInPandas. Beyond the shared process-UDF
contract (per-row failure isolation, journal resume), the loudness-specific
behaviors are pinned: -inf/nan summaries must PARSE (silence is data, not a
failure — loudness_measure.py:60-67), and the static-gain formula must
clamp against true peak, cap boost, and zero out silence
(loudness_measure.py:85-108).
"""

from __future__ import annotations

import os
import sys

import pytest

from tlmc_etl_spark.operators.process import measure_loudness_paths

FAKE_FFMPEG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "fake_ffmpeg"
)
CMD = [sys.executable, FAKE_FFMPEG]


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    (d / "loud.flac").write_bytes(b"x" * 1234)     # I=-13.4, Peak=-3.4, LRA=3.4
    (d / "quiet.flac").write_bytes(b"x" * 1000)    # I=-20.0, Peak=-4.0, LRA=10.0
    (d / "silent.flac").write_bytes(b"SILENT" + b"\x00" * 50)
    (d / "ungated.flac").write_bytes(b"NANGATE" + b"\x00" * 50)
    (d / "broken.flac").write_bytes(b"CORRUPT" + b"z" * 50)
    return d


def _paths_df(spark, d, names):
    return spark.createDataFrame([(str(d / n),) for n in names], "path string")


def _by_name(rows):
    return {os.path.basename(r["path"]): r for r in rows}


def test_summary_parses_from_real_child_stderr(spark, audio_dir):
    rows = _by_name(
        measure_loudness_paths(
            _paths_df(spark, audio_dir, ["loud.flac", "quiet.flac"]), ffmpeg_cmd=CMD
        ).collect()
    )
    loud = rows["loud.flac"]
    assert loud["ok"] and loud["reason"] is None
    assert loud["i"] == pytest.approx(-13.4)
    assert loud["tp"] == pytest.approx(-3.4)
    assert loud["lra"] == pytest.approx(3.4)
    assert rows["quiet.flac"]["i"] == pytest.approx(-20.0)


def test_silence_and_nan_parse_as_null_not_failure(spark, audio_dir):
    # The digits-only-regex bug: ebur128 prints "-inf" for a silent track's
    # peak and "nan" for an ungateable stream; both rows must come back
    # ok=true with NULL measurements, not as parse failures.
    rows = _by_name(
        measure_loudness_paths(
            _paths_df(spark, audio_dir, ["silent.flac", "ungated.flac"]), ffmpeg_cmd=CMD
        ).collect()
    )
    s = rows["silent.flac"]
    assert s["ok"] and s["i"] == pytest.approx(-70.0) and s["tp"] is None
    u = rows["ungated.flac"]
    assert u["ok"] and u["i"] is None and u["tp"] is None and u["lra"] is None


def test_bad_exit_and_missing_file_fail_their_own_rows(spark, audio_dir):
    names = ["loud.flac", "broken.flac", "does_not_exist.flac"]
    rows = _by_name(
        measure_loudness_paths(_paths_df(spark, audio_dir, names), ffmpeg_cmd=CMD).collect()
    )
    assert len(rows) == 3, "every input row must come back, failed or not"
    assert rows["loud.flac"]["ok"]
    assert not rows["broken.flac"]["ok"] and rows["broken.flac"]["reason"] == "exit_1"
    assert not rows["does_not_exist.flac"]["ok"]
    assert rows["does_not_exist.flac"]["reason"] == "exit_2"


def test_hung_measurement_times_out_its_row_only(spark, audio_dir):
    (audio_dir / "hang.flac").write_bytes(b"SLEEP" + b"z" * 10)
    rows = _by_name(
        measure_loudness_paths(
            _paths_df(spark, audio_dir, ["hang.flac", "loud.flac"]),
            ffmpeg_cmd=CMD,
            timeout_s=2.0,
        ).collect()
    )
    assert not rows["hang.flac"]["ok"] and rows["hang.flac"]["reason"] == "timeout"
    assert rows["loud.flac"]["ok"], "timeout must not poison the batch"


def test_journal_resume_skips_done_paths_before_spawning(spark, audio_dir):
    done = spark.createDataFrame([(str(audio_dir / "loud.flac"),)], "path string")
    got = measure_loudness_paths(
        _paths_df(spark, audio_dir, ["loud.flac", "quiet.flac"]), ffmpeg_cmd=CMD, done=done
    ).collect()
    assert [os.path.basename(r["path"]) for r in got] == ["quiet.flac"]


def test_default_cmd_places_input_before_output_options():
    # ffmpeg argv is positional: -i <input> must precede the output options,
    # and a wrapper command without the placeholder gets it appended.
    from tlmc_etl_spark.operators.process import FFMPEG_EBUR128_CMD

    i = FFMPEG_EBUR128_CMD.index("{input}")
    assert FFMPEG_EBUR128_CMD[i - 1] == "-i"
    assert "-f" in FFMPEG_EBUR128_CMD[i:], "output muxer options follow the input"
