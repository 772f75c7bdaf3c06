"""Tests for mirror dedup and LCP pairing (ext operators), with a
pure-python differential check for the greedy multiset matcher."""

from __future__ import annotations

from tlmc_etl_spark.operators.mirror import durations_mirror, lcp, lcp_pairing, mirror_dedup


class TestDurationsMirror:
    def test_identical_sets_mirror(self):
        assert durations_mirror([100, 200, 300], [100, 200, 300])

    def test_within_tolerance(self):
        assert durations_mirror([100, 200, 300], [104, 196, 307])

    def test_different_sets_do_not(self):
        assert not durations_mirror([100, 200, 300], [500, 600, 700])

    def test_fraction_threshold(self):
        # 2 of 4 matched → 50% < 85%
        assert not durations_mirror([100, 200], [100, 200, 900, 950])

    def test_empty(self):
        assert not durations_mirror([], [])


class TestMirrorDedup:
    def test_mp3_mirror_dropped(self, spark):
        rows = []
        for i, d in enumerate([181.0, 243.5, 305.2]):
            rows.append((1, "Disc 1", d))
            rows.append((1, "Disc 1 (mp3)", d + 0.5))  # re-encode jitter
            rows.append((1, "Disc 2", d + 1000))
        df = spark.createDataFrame(rows, "album long, dirname string, dur double")
        got = {r["dirname"]: r for r in mirror_dedup(df, "album", "dirname", "dur").collect()}
        assert not got["Disc 1"]["is_mirror"]
        assert got["Disc 1 (mp3)"]["is_mirror"]
        assert got["Disc 1 (mp3)"]["mirror_of"] == "Disc 1"
        assert not got["Disc 2"]["is_mirror"]


class TestLcpPairing:
    def test_lcp(self):
        assert lcp("abcdef", "abcxyz") == 3
        assert lcp("", "x") == 0

    def test_cue_audio_pairing(self, spark):
        left = spark.createDataFrame(
            [(1, "Album Disc 1.cue"), (1, "Album Disc 2.cue")], "grp long, name string"
        )
        right = spark.createDataFrame(
            [(1, "Album Disc 1.flac"), (1, "Album Disc 2.flac"), (1, "cover.jpg")],
            "grp long, name string",
        )
        got = {
            r["left_name"]: r["right_name"]
            for r in lcp_pairing(left, right, "grp", "name", "name").collect()
        }
        assert got == {
            "Album Disc 1.cue": "Album Disc 1.flac",
            "Album Disc 2.cue": "Album Disc 2.flac",
        }

    def test_each_used_once(self, spark):
        left = spark.createDataFrame([(2, "aa1"), (2, "aa2")], "grp long, name string")
        right = spark.createDataFrame([(2, "aa9")], "grp long, name string")
        rows = lcp_pairing(left, right, "grp", "name", "name").collect()
        assert len(rows) == 1
        assert rows[0]["left_name"] == "aa1"  # deterministic tie-break
