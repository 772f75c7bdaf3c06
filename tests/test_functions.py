"""Unit + property tests for the scalar function library."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tlmc_etl_spark.functions.text import (
    extract_brackets,
    match_key,
    parse_track_filename,
    remove_brackets,
    typeid_decode,
    typeid_encode,
)


class TestExtractBrackets:
    def test_basic(self):
        assert extract_brackets("2011.05.08 [ABC-123] Title [C80]") == ["ABC-123", "C80"]

    def test_nested_stays_in_outer(self):
        assert extract_brackets("[a [b] c] d") == ["a [b] c"]

    def test_mixed_bracket_kinds(self):
        assert extract_brackets("(one) [two] 【three】") == ["one", "two", "three"]

    def test_unterminated_skipped(self):
        assert extract_brackets("[open (never") == []
        assert extract_brackets("[ok] [open") == ["ok"]

    def test_none_and_empty(self):
        assert extract_brackets(None) == []
        assert extract_brackets("") == []

    @given(st.text(alphabet="ab[]() ", max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_never_raises_and_contents_are_substrings(self, s):
        for frag in extract_brackets(s):
            assert frag in s


class TestRemoveBrackets:
    def test_basic(self):
        assert remove_brackets("2011.05.08 [ABC-123] Title [C80]") == "2011.05.08  Title"

    def test_unbalanced_kept(self):
        assert remove_brackets("a [b") == "a [b"

    @given(st.text(alphabet="xy[]（） ", max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_never_raises(self, s):
        remove_brackets(s)


class TestMatchKey:
    def test_width_and_case_fold(self):
        assert match_key("ＲＯＭＡＪＩ Ver.") == match_key("romaji ver")

    def test_strips_punct(self):
        assert match_key("Silver  Moon!! (inst)") == "silvermooninst"

    def test_cjk_preserved(self):
        assert match_key("東方 Project") == "東方project"


class TestTypeId:
    def test_roundtrip(self):
        for _ in range(50):
            u = uuid.uuid4().hex
            prefix, back = typeid_decode(typeid_encode(u, "trk"))
            assert prefix == "trk" and back == u

    def test_format(self):
        t = typeid_encode("0" * 32, "rel")
        assert t == "rel_" + "0" * 26

    def test_spec_golden_vectors(self):
        # The public TypeID spec's boundary vectors (spec/valid.yml):
        # the encoding is pinned against published constants, not just a
        # round-trip through this module's own inverse.
        golden = [
            ("00000000000000000000000000000000", "00000000000000000000000000"),
            ("00000000000000000000000000000001", "00000000000000000000000001"),
            ("0000000000000000000000000000000a", "0000000000000000000000000a"),
            ("00000000000000000000000000000010", "0000000000000000000000000g"),
            ("00000000000000000000000000000020", "00000000000000000000000010"),
            ("ffffffffffffffffffffffffffffffff", "7zzzzzzzzzzzzzzzzzzzzzzzzz"),
        ]
        for hex_in, body in golden:
            assert typeid_encode(hex_in, "prefix") == f"prefix_{body}", hex_in
            assert typeid_decode(f"prefix_{body}") == ("prefix", hex_in)

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError):
            typeid_encode("xyz")


class TestParseTrackFilename:
    def test_canonical_and_fallback(self, spark):
        df = spark.createDataFrame(
            [("(07) [Alice] Wonder Story.flac",), ("07 no brackets.mp3",)], "fname string"
        )
        rows = df.select(parse_track_filename("fname").alias("p")).collect()
        good, bad = rows[0]["p"], rows[1]["p"]
        assert good["track_no"] == 7
        assert good["artist"] == "Alice"
        assert good["title"] == "Wonder Story"
        assert good["ext"] == "flac"
        assert bad["track_no"] is None and bad["artist"] is None


class TestCueParser:
    CUE = '''REM GENRE Doujin
TITLE "Album Title"
PERFORMER "Circle Name"
FILE "CDImage.flac" WAVE
  TRACK 01 AUDIO
    TITLE "Opening"
    INDEX 01 00:00:00
  TRACK 02 AUDIO
    TITLE "Second Song"
    PERFORMER "Guest"
    INDEX 00 03:40:00
    INDEX 01 03:42:50
  TRACK 03 AUDIO
    INDEX 01 07:00:74
'''

    def test_parse_cue_rows(self):
        from tlmc_etl_spark.functions.media import parse_cue

        rows = parse_cue(self.CUE)
        assert [r["track_number"] for r in rows] == [1, 2, 3]
        assert rows[0]["file_path"] == "CDImage.flac"
        assert rows[0]["title"] == "Opening"
        assert rows[0]["performer"] == "Circle Name"  # inherited
        assert rows[1]["performer"] == "Guest"  # overridden
        assert rows[2]["title"] == "Album Title"  # sheet fallback
        # INDEX 01 only; 03:42:50 = (3*60+42)*75+50 frames
        assert rows[1]["index01_frames"] == (3 * 60 + 42) * 75 + 50
        assert rows[1]["start_seconds"] == round(rows[1]["index01_frames"] / 75.0, 6)
        assert rows[2]["index01_frames"] == (7 * 60) * 75 + 74

    def test_parse_cue_degenerate(self):
        from tlmc_etl_spark.functions.media import parse_cue

        assert parse_cue(None) == []
        assert parse_cue("") == []
        assert parse_cue("garbage\nlines\n") == []

    def test_cue_udf_explodes_to_tracks(self, spark):
        from pyspark.sql import functions as F

        from tlmc_etl_spark.functions.media import cue_tracks_udf

        df = spark.createDataFrame([("a1", self.CUE), ("a2", None)], "album string, cue string")
        out = (
            df.select("album", F.explode(cue_tracks_udf()("cue")).alias("t"))
            .select("album", "t.track_number", "t.start_seconds")
            .collect()
        )
        assert len(out) == 3 and all(r["album"] == "a1" for r in out)


class TestStreaminfoFastPath:
    def test_duration_roundtrip(self):
        from tlmc_etl_spark.functions.media import make_flac_header, streaminfo_duration

        hdr = make_flac_header(44100, 44100 * 225)
        assert streaminfo_duration(hdr) == 225.0
        hdr2 = make_flac_header(48000, 48000 * 61 + 24000)
        assert streaminfo_duration(hdr2) == 61.5

    def test_non_flac_falls_through(self):
        from tlmc_etl_spark.functions.media import streaminfo_duration

        assert streaminfo_duration(None) is None
        assert streaminfo_duration(b"ID3\x04" + bytes(100)) is None
        assert streaminfo_duration(b"fLa") is None


class TestAdtsFraming:
    """ADTS framing parser (functions/media.py): the seekable frame index
    for the HLS/AAC MERT input (reference encodes libfdk_aac,
    hls_assignment.py; input choice V6-MIGRATION-HANDOFF issue G5)."""

    def test_roundtrip_offsets_and_fields(self):
        from tlmc_etl_spark.functions.media import (
            make_adts_stream,
            parse_adts_frames,
        )

        sizes = [64, 80, 100, 7, 1000]
        frames = parse_adts_frames(make_adts_stream(sizes))
        assert [f["idx"] for f in frames] == [0, 1, 2, 3, 4]
        assert [f["byte_length"] for f in frames] == [s + 7 for s in sizes]
        offs = [f["byte_offset"] for f in frames]
        assert offs == [0, 71, 158, 265, 279]
        assert all(f["sample_rate"] == 24000 for f in frames)  # sf_index 6
        assert all(f["channels"] == 2 for f in frames)
        assert all(f["n_samples"] == 1024 for f in frames)

    def test_sample_rate_table(self):
        from tlmc_etl_spark.functions.media import (
            make_adts_stream,
            parse_adts_frames,
        )

        assert parse_adts_frames(make_adts_stream([10], sf_index=3))[0][
            "sample_rate"
        ] == 48000
        assert parse_adts_frames(make_adts_stream([10], sf_index=4))[0][
            "sample_rate"
        ] == 44100

    def test_non_adts_returns_empty(self):
        from tlmc_etl_spark.functions.media import parse_adts_frames

        assert parse_adts_frames(None) == []
        assert parse_adts_frames(b"") == []
        assert parse_adts_frames(b"fLaC" + bytes(50)) == []

    def test_corrupt_midstream_raises(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_adts_stream,
            parse_adts_frames,
        )

        s = make_adts_stream([64, 64])
        with pytest.raises(ValueError, match="adts"):
            parse_adts_frames(s[:-10])  # truncated final frame
        torn = bytearray(s)
        torn[71] = 0x00  # lose sync at frame 2
        with pytest.raises(ValueError, match="lost sync"):
            parse_adts_frames(bytes(torn))
        layered = bytearray(s)
        layered[1] = 0xF7  # layer bits nonzero
        with pytest.raises(ValueError, match="layer"):
            parse_adts_frames(bytes(layered))

    def test_13bit_length_bound(self):
        import pytest

        from tlmc_etl_spark.functions.media import make_adts_frame

        with pytest.raises(ValueError):
            make_adts_frame((1 << 13) - 7)  # frame_len == 8192 overflows
        frame = make_adts_frame((1 << 13) - 8)  # max representable
        assert len(frame) == (1 << 13) - 1


class TestMp3Framing:
    """MPEG-1 Layer III framing (functions/media.py): the mutagen-grade
    frame index + the bit-reservoir seek rule. PCM decode is deliberately
    out of scope (COVERAGE: spec Huffman tables unsourceable here)."""

    def test_frame_geometry_and_fields(self):
        from tlmc_etl_spark.functions.media import (
            make_mp3_stream,
            parse_mp3_frames,
        )

        fr = parse_mp3_frames(
            make_mp3_stream([(9, 0, 0), (9, 1, 0), (14, 0, 511)])
        )
        assert [f["byte_length"] for f in fr] == [
            144 * 128000 // 44100,
            144 * 128000 // 44100 + 1,
            144 * 320000 // 44100,
        ]
        assert [f["bitrate_kbps"] for f in fr] == [128, 128, 320]
        assert fr[2]["main_data_begin"] == 511
        assert all(f["n_samples"] == 1152 for f in fr)
        assert all(
            f["main_data_bytes"] == f["byte_length"] - 36 for f in fr
        )

    def test_id3v2_prefix_skipped_and_offsets_shift(self):
        from tlmc_etl_spark.functions.media import (
            make_mp3_stream,
            parse_mp3_frames,
        )

        plain = parse_mp3_frames(make_mp3_stream([(5, 0, 0), (5, 0, 0)]))
        tagged = parse_mp3_frames(
            make_mp3_stream([(5, 0, 0), (5, 0, 0)], id3v2_bytes=200)
        )
        assert tagged[0]["byte_offset"] == plain[0]["byte_offset"] + 210
        assert [f["byte_length"] for f in tagged] == [
            f["byte_length"] for f in plain
        ]

    def test_id3v1_trailer_ends_walk(self):
        from tlmc_etl_spark.functions.media import (
            make_mp3_stream,
            parse_mp3_frames,
        )

        s = make_mp3_stream([(5, 0, 0)]) + b"TAG" + bytes(125)
        assert len(parse_mp3_frames(s)) == 1

    def test_reservoir_walkback(self):
        from tlmc_etl_spark.functions.media import (
            make_mp3_stream,
            mp3_reservoir_start,
            parse_mp3_frames,
        )

        # frame main-data sizes: idx1=32kbps -> 104-36=68 bytes each
        fr = parse_mp3_frames(
            make_mp3_stream(
                [(1, 0, 0), (1, 0, 0), (1, 0, 50), (1, 0, 100), (1, 0, 500)]
            )
        )
        assert mp3_reservoir_start(fr, 0) == 0
        assert mp3_reservoir_start(fr, 1) == 1  # mdb 0: starts at itself
        assert mp3_reservoir_start(fr, 2) == 1  # 50 <= 68: one frame back
        assert mp3_reservoir_start(fr, 3) == 1  # 100 <= 68+68: two back
        assert mp3_reservoir_start(fr, 4) == 0  # 500 > all: floor at head

    def test_strictness(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_mp3_stream,
            parse_mp3_frames,
        )

        assert parse_mp3_frames(None) == []
        assert parse_mp3_frames(b"") == []
        assert parse_mp3_frames(b"RIFFxxxxWAVE") == []
        s = make_mp3_stream([(5, 0, 0), (5, 0, 0)])
        with pytest.raises(ValueError, match="mp3"):
            parse_mp3_frames(s[:-20])
        torn = bytearray(s)
        torn[len(s) // 2 - 2 : len(s) // 2 + 2] = b"\x00\x00\x00\x00"
        # corrupting mid-stream either loses sync or truncates — ValueError
        with pytest.raises(ValueError):
            parse_mp3_frames(bytes(torn[: len(s) - 10]))

    def test_layer2_rejected(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_mp3_frame,
            parse_mp3_frames,
        )

        f = bytearray(make_mp3_frame(5))
        f[1] = 0xFD  # layer bits -> Layer II
        with pytest.raises(ValueError, match="Layer III"):
            parse_mp3_frames(bytes(f))


class TestH264Framing:
    """Annex-B NAL framing + the keyframe-alignment seek rule
    (functions/media.py). Entropy decode stays at the codec boundary."""

    def test_nal_walk_fields(self):
        from tlmc_etl_spark.functions.media import make_nal, parse_annexb_nals

        s = (
            make_nal(7, 10) + make_nal(8, 4)
            + make_nal(5, 100, long_code=True) + make_nal(1, 50, ref_idc=2)
        )
        nals = parse_annexb_nals(s)
        assert [f["nal_type"] for f in nals] == [7, 8, 5, 1]
        assert nals[2]["start_code_len"] == 4
        assert nals[2]["is_keyframe"] and not nals[3]["is_keyframe"]
        assert nals[3]["nal_ref_idc"] == 2
        assert sum(f["byte_length"] for f in nals) == len(s)
        offs = [f["byte_offset"] for f in nals]
        assert offs == sorted(offs) and offs[0] == 0

    def test_four_byte_code_zero_stays_with_next_unit(self):
        from tlmc_etl_spark.functions.media import make_nal, parse_annexb_nals

        s = make_nal(1, 8) + make_nal(1, 8, long_code=True)
        a, b = parse_annexb_nals(s)
        # the long code's leading zero belongs to unit b, not unit a
        assert a["byte_length"] == 3 + 1 + 8
        assert b["start_code_len"] == 4
        assert a["byte_length"] + b["byte_length"] == len(s)

    def test_keyframe_start_rule(self):
        from tlmc_etl_spark.functions.media import (
            h264_keyframe_start,
            make_nal,
            parse_annexb_nals,
        )

        s = (
            make_nal(7, 6) + make_nal(8, 4) + make_nal(5, 80)  # gop 0
            + make_nal(1, 30) + make_nal(1, 30)
            + make_nal(6, 5)                                    # SEI
            + make_nal(7, 6) + make_nal(8, 4) + make_nal(5, 80)  # gop 1
            + make_nal(1, 30)
        )
        nals = parse_annexb_nals(s)
        # frames in gop 1 back up through IDR(8) + PPS(7)+SPS(6)+SEI(5)
        assert h264_keyframe_start(nals, 9) == 5
        assert h264_keyframe_start(nals, 8) == 5
        # frames in gop 0 back up to the head
        assert h264_keyframe_start(nals, 4) == 0
        # a stream with no preceding IDR floors at 0
        only_p = parse_annexb_nals(make_nal(1, 10) + make_nal(1, 10))
        assert h264_keyframe_start(only_p, 1) == 0

    def test_strictness(self):
        import pytest

        from tlmc_etl_spark.functions.media import make_nal, parse_annexb_nals

        assert parse_annexb_nals(None) == []
        assert parse_annexb_nals(b"") == []
        assert parse_annexb_nals(b"mdat....") == []
        bad = bytearray(make_nal(1, 8))
        bad[3] |= 0x80  # forbidden_zero_bit
        with pytest.raises(ValueError, match="forbidden"):
            parse_annexb_nals(bytes(bad))


class TestXingHeader:
    def test_vbr_header_roundtrip(self):
        from tlmc_etl_spark.functions.media import (
            make_mp3_frame,
            make_xing_frame,
            parse_xing_header,
        )

        toc = [min(255, i * 256 // 100) for i in range(100)]
        x = parse_xing_header(
            make_xing_frame(5000, 1_000_000, toc) + make_mp3_frame(5)
        )
        assert x["tag"] == "Xing" and x["vbr"]
        assert x["n_frames"] == 5000 and x["n_bytes"] == 1_000_000
        assert x["toc"] == toc
        assert x["duration_s"] == round(5000 * 1152 / 44100, 6)

    def test_info_tag_and_no_toc(self):
        from tlmc_etl_spark.functions.media import (
            make_xing_frame,
            parse_xing_header,
        )

        x = parse_xing_header(make_xing_frame(10, 999, None, vbr=False))
        assert x["tag"] == "Info" and not x["vbr"]
        assert "toc" not in x

    def test_absent_tag_returns_none(self):
        from tlmc_etl_spark.functions.media import (
            make_mp3_frame,
            parse_xing_header,
        )

        assert parse_xing_header(make_mp3_frame(5)) is None
        assert parse_xing_header(b"junk") is None
        assert parse_xing_header(None) is None


class TestFlacSeektable:
    def test_metadata_walk(self):
        from tlmc_etl_spark.functions.media import (
            make_flac_with_seektable,
            parse_flac_metadata,
        )

        pts = [(0, 0, 4096), (441000, 180013, 4096), (882000, 360220, 4096)]
        f = make_flac_with_seektable(44100, 44100 * 60, pts, n_placeholders=2)
        m = parse_flac_metadata(f)
        assert m["sample_rate"] == 44100
        assert m["total_samples"] == 44100 * 60
        assert m["seekpoints"] == pts  # placeholders dropped
        assert m["audio_offset"] == len(f)

    def test_non_flac_and_truncation(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_flac_with_seektable,
            parse_flac_metadata,
        )

        assert parse_flac_metadata(None) is None
        assert parse_flac_metadata(b"ID3\x04" + bytes(60)) is None
        f = make_flac_with_seektable(44100, 1000, [(0, 0, 4096)])
        with pytest.raises(ValueError, match="flac"):
            parse_flac_metadata(f[:-6])

    def test_bad_seektable_length_raises(self):
        import pytest

        from tlmc_etl_spark.functions.media import parse_flac_metadata

        bad = (
            b"fLaC"
            + bytes([0x00, 0, 0, 34]) + bytes(34)
            + bytes([0x80 | 0x03, 0, 0, 17]) + bytes(17)  # not 18-multiple
        )
        with pytest.raises(ValueError, match="SEEKTABLE"):
            parse_flac_metadata(bad)


class TestFramingParserRobustness:
    """Fuzz the binary framing parsers: arbitrary bytes must yield []
    (not-this-format), None, or ValueError — NEVER a wrong index, an
    uncaught IndexError/struct.error, or a hang. Mutated valid streams
    must never parse to a DIFFERENT geometry silently (they either still
    parse to a prefix-consistent index or raise)."""

    def _parsers(self):
        from tlmc_etl_spark.functions.media import (
            parse_adts_frames,
            parse_annexb_nals,
            parse_flac_metadata,
            parse_mp3_frames,
            parse_xing_header,
        )
        from tlmc_etl_spark.operators.flac import parse_flac_audio

        return [
            parse_adts_frames,
            parse_mp3_frames,
            parse_annexb_nals,
            parse_flac_metadata,
            parse_flac_audio,
            parse_xing_header,
        ]

    def test_random_bytes_never_leak_exceptions(self):
        import numpy as np

        rng = np.random.default_rng(101)
        for parser in self._parsers():
            for trial in range(200):
                blob = bytes(rng.integers(0, 256, size=rng.integers(0, 400),
                                          dtype=np.uint8))
                try:
                    parser(blob)
                except ValueError:
                    pass
                except Exception as e:
                    raise AssertionError(
                        f"{parser.__name__} leaked {type(e).__name__} on "
                        f"trial {trial}: {e}"
                    )

    def test_mutated_valid_streams_fail_loudly_or_stay_consistent(self):
        import numpy as np

        from tlmc_etl_spark.functions.media import (
            make_adts_stream,
            make_mp3_stream,
            make_nal,
            parse_adts_frames,
            parse_mp3_frames,
            parse_annexb_nals,
        )

        rng = np.random.default_rng(103)
        streams = [
            (parse_adts_frames, make_adts_stream([64, 80, 100, 32, 200])),
            (parse_mp3_frames, make_mp3_stream(
                [(5, 0, 0), (9, 1, 100), (2, 0, 300)])),
            (parse_annexb_nals, make_nal(7, 8) + make_nal(5, 60)
             + make_nal(1, 40) + make_nal(1, 40)),
        ]
        for parser, s in streams:
            clean = parser(s)
            total = sum(f["byte_length"] for f in clean)
            assert total == len(s)
            for trial in range(150):
                mut = bytearray(s)
                i = int(rng.integers(0, len(s)))
                mut[i] = int(rng.integers(0, 256))
                try:
                    got = parser(bytes(mut))
                except ValueError:
                    continue  # loud failure: the contract
                # parsed without error: the walk must still be
                # internally consistent (contiguous, inside the buffer)
                pos = got[0]["byte_offset"] if got else 0
                for f in got:
                    assert f["byte_offset"] == pos, (parser.__name__, i)
                    assert f["byte_length"] > 0
                    pos += f["byte_length"]
                assert pos <= len(mut), (parser.__name__, i)

    def test_truncation_sweep(self):
        from tlmc_etl_spark.functions.media import (
            make_adts_stream,
            make_mp3_stream,
            parse_adts_frames,
            parse_mp3_frames,
        )

        for parser, s in (
            (parse_adts_frames, make_adts_stream([64, 80, 100])),
            (parse_mp3_frames, make_mp3_stream([(5, 0, 0), (9, 1, 7)])),
        ):
            full = parser(s)
            for cut in range(1, len(s)):
                try:
                    got = parser(s[:cut])
                except ValueError:
                    continue
                # a clean parse of a prefix must be a PREFIX of the full
                # index (complete frames only), never a reinterpretation
                assert got == full[: len(got)], (parser.__name__, cut)


class TestParserContractRegressions:
    """Round-10 review findings: parser-contract leaks reproduced and
    pinned — each scenario previously leaked IndexError/struct.error or
    fabricated zeros instead of the documented ValueError."""

    def test_annexb_trailing_bare_start_code(self):
        import pytest

        from tlmc_etl_spark.functions.media import parse_annexb_nals

        with pytest.raises(ValueError):
            parse_annexb_nals(
                b"\x00\x00\x01\x41\x01\x02" + b"\x00\x00\x01"
            )

    def test_flac_short_streaminfo_block(self):
        import pytest

        from tlmc_etl_spark.functions.media import parse_flac_metadata

        with pytest.raises(ValueError):
            parse_flac_metadata(b"fLaC" + bytes([0x80, 0, 0, 10]) + bytes(10))

    def test_xing_truncated_after_flags_never_fabricates_zeros(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_xing_frame,
            parse_xing_header,
        )

        full = make_xing_frame(5000, 1_000_000)
        with pytest.raises(ValueError, match="xing"):
            parse_xing_header(full[:44])  # cut right after tag+flags
        # a cut before the tag is 'absent tag', not an error
        assert parse_xing_header(full[:20]) is None


class TestSpsParse:
    """H.264 SPS resolution parse. The hand-assembled byte test pins the
    Exp-Golomb layout independently of make_sps (same argument as the
    solid-gray JPEG DC test: a shared layout bug in writer+reader can't
    survive a byte string computed by hand from the spec)."""

    def test_hand_assembled_sps_64x48(self):
        from tlmc_etl_spark.functions.media import make_sps, parse_sps

        # profile 66, level 30, 4x3 macroblocks, no crop:
        # fields 1|1|011|010|0|00100|011|1|1|0|0|stop1 pad -> DA 11 E4
        hand = bytes([0x67, 66, 0x00, 30, 0xDA, 0x11, 0xE4])
        got = parse_sps(hand)
        assert (got["width"], got["height"]) == (64, 48)
        assert got["profile_idc"] == 66 and got["level_idc"] == 30
        assert make_sps(64, 48, level_idc=30) == hand

    def test_roundtrip_with_cropping(self):
        from tlmc_etl_spark.functions.media import make_sps, parse_sps

        for wh in [(1920, 1080), (1280, 720), (1918, 1078), (320, 240)]:
            got = parse_sps(make_sps(*wh))
            assert (got["width"], got["height"]) == wh, wh

    def test_high_profile_raises_not_guesses(self):
        import pytest

        from tlmc_etl_spark.functions.media import make_sps, parse_sps

        sps = bytearray(make_sps(640, 480))
        sps[1] = 100  # High profile: chroma-format branch we refuse
        with pytest.raises(ValueError, match="profile_idc 100"):
            parse_sps(bytes(sps))

    def test_non_sps_and_torn_input(self):
        import pytest

        from tlmc_etl_spark.functions.media import make_sps, parse_sps

        assert parse_sps(None) is None
        assert parse_sps(b"\x41\x99\x88") is None  # non-IDR slice NAL
        with pytest.raises(ValueError):
            parse_sps(make_sps(1920, 1080)[:4])

    def test_emulation_prevention_stripped(self):
        from tlmc_etl_spark.functions.media import (
            _strip_emulation,
        )

        assert _strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
        assert _strip_emulation(b"ab\x00\x00\x03\x00\x00\x03c") == b"ab\x00\x00\x00\x00c"


class TestSeekRuleBoundary:
    """The two seek-rule helpers share the binary parsers'
    '[]/None or ValueError' contract — an empty list or out-of-range
    index must surface as ValueError, never raw IndexError."""

    def test_mp3_reservoir_start_bad_index(self):
        import pytest

        from tlmc_etl_spark.functions.media import mp3_reservoir_start

        with pytest.raises(ValueError, match="truncated or corrupt"):
            mp3_reservoir_start([], 0)
        with pytest.raises(ValueError, match="truncated or corrupt"):
            mp3_reservoir_start([{"main_data_begin": 0}], 3)

    def test_h264_keyframe_start_bad_index(self):
        import pytest

        from tlmc_etl_spark.functions.media import h264_keyframe_start

        with pytest.raises(ValueError, match="truncated or corrupt"):
            h264_keyframe_start([], 0)
        with pytest.raises(ValueError, match="truncated or corrupt"):
            h264_keyframe_start([{"nal_type": 1}], 5)


class TestVorbisComment:
    """Type-4 VORBIS_COMMENT parse (functions/media.py): the in-container
    equivalent of the reference's ffprobe tag fetch
    (Shared/utils.py:80-113) feeding info_scanner ph2's lowercase-key
    normalization (info_scanner_ph2.py:148-151)."""

    def test_tags_roundtrip_with_unicode(self):
        from tlmc_etl_spark.functions.media import (
            make_flac_with_tags,
            parse_flac_metadata,
        )

        m = parse_flac_metadata(
            make_flac_with_tags(
                44100, 1000,
                {"TITLE": "Foo ♪", "Artist": "Bar", "TRACKNUMBER": "7/12"},
                vendor="ref 1.4",
            )
        )
        assert m["vendor"] == "ref 1.4"
        assert m["tags"] == {
            "title": "Foo ♪", "artist": "Bar", "tracknumber": "7/12"
        }
        assert m["sample_rate"] == 44100  # STREAMINFO still parsed

    def test_repeated_key_keeps_last(self):
        from tlmc_etl_spark.functions.media import (
            make_flac_with_tags,
            parse_flac_metadata,
        )

        m = parse_flac_metadata(
            make_flac_with_tags(44100, 0, [("TITLE", "a"), ("title", "b")])
        )
        assert m["tags"] == {"title": "b"}

    def test_value_may_contain_equals(self):
        from tlmc_etl_spark.functions.media import (
            make_flac_with_tags,
            parse_flac_metadata,
        )

        m = parse_flac_metadata(
            make_flac_with_tags(44100, 0, {"COMMENT": "x=y=z"})
        )
        assert m["tags"]["comment"] == "x=y=z"

    def test_untagged_stream_has_empty_tags(self):
        from tlmc_etl_spark.functions.media import (
            make_flac_header,
            parse_flac_metadata,
        )

        m = parse_flac_metadata(make_flac_header(44100, 10))
        assert m["tags"] == {} and m["vendor"] is None

    def test_strictness(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_flac_with_tags,
            parse_flac_metadata,
        )

        f = make_flac_with_tags(44100, 0, {"K": "vv"})
        with pytest.raises(ValueError):
            parse_flac_metadata(f[:-3])  # torn entry
        bad = bytearray(f)
        bad[bytes(f).find(b"K=vv") + 1] = ord("_")  # missing separator
        with pytest.raises(ValueError, match="missing '='"):
            parse_flac_metadata(bytes(bad))
        bad = bytearray(f)
        bad[bytes(f).find(b"K=vv") + 2] = 0xFF  # invalid UTF-8
        with pytest.raises(ValueError, match="not UTF-8"):
            parse_flac_metadata(bytes(bad))


def _ape_tag(n_items: int = 2, with_header: bool = True, version: int = 2000) -> bytes:
    """APEv1/v2 tag bytes (test double): items + 32-byte footer, optional
    32-byte header (flag bit 31). Size field = items + footer, per spec."""
    items = b""
    for i in range(n_items):
        key = f"Key{i}".encode()
        val = f"value-{i}".encode()
        items += len(val).to_bytes(4, "little") + bytes(4) + key + b"\x00" + val
    size = len(items) + 32
    flags = (1 << 31) if with_header else 0

    def block(is_header: bool) -> bytes:
        f = flags | ((1 << 29) if is_header else 0)
        return (
            b"APETAGEX"
            + version.to_bytes(4, "little")
            + size.to_bytes(4, "little")
            + n_items.to_bytes(4, "little")
            + f.to_bytes(4, "little")
            + bytes(8)
        )

    out = (block(True) if with_header else b"") + items + block(False)
    return out


class TestMp3Trailers:
    """Real-world MP3 tails: [audio][APEv1/v2][ID3v1] in any present
    subset — the frame walk must strip trailers from the END (a
    headerless APE tag has no forward-detectable magic)."""

    def _frames(self):
        from tlmc_etl_spark.functions.media import make_mp3_stream

        return make_mp3_stream([(5, 0, 0), (9, 1, 100)])

    def test_ape_v2_with_header_then_id3v1(self):
        from tlmc_etl_spark.functions.media import parse_mp3_frames

        s = self._frames() + _ape_tag(with_header=True) + b"TAG" + bytes(125)
        got = parse_mp3_frames(s)
        assert len(got) == 2
        assert sum(f["byte_length"] for f in got) == len(self._frames())

    def test_headerless_ape_v1_only(self):
        from tlmc_etl_spark.functions.media import parse_mp3_frames

        s = self._frames() + _ape_tag(with_header=False, version=1000)
        assert len(parse_mp3_frames(s)) == 2

    def test_ape_size_overrun_raises(self):
        import pytest

        from tlmc_etl_spark.functions.media import parse_mp3_frames

        tag = bytearray(_ape_tag(with_header=False))
        tag[-20:-16] = (10_000_000).to_bytes(4, "little")  # size field
        with pytest.raises(ValueError, match="APE tag"):
            parse_mp3_frames(self._frames() + bytes(tag))

    def test_mutated_tagged_tail_fails_loudly_or_stays_consistent(self):
        # the framing-fuzz discipline extended over the trailer bytes
        import numpy as np

        from tlmc_etl_spark.functions.media import parse_mp3_frames

        s = self._frames() + _ape_tag() + b"TAG" + bytes(125)
        rng = np.random.default_rng(107)
        for _ in range(150):
            mut = bytearray(s)
            i = int(rng.integers(0, len(s)))
            mut[i] = int(rng.integers(0, 256))
            try:
                got = parse_mp3_frames(bytes(mut))
            except ValueError:
                continue
            pos = got[0]["byte_offset"] if got else 0
            for f in got:
                assert f["byte_offset"] == pos
                pos += f["byte_length"]
            assert pos <= len(mut)


class TestId3v2:
    """ID3v2.3/2.4 text-frame parse (functions/media.py) — the MP3 twin
    of the VORBIS_COMMENT walk, feeding the same ph2 tag coalesce."""

    def test_text_frames_roundtrip(self):
        from tlmc_etl_spark.functions.media import make_id3v2, parse_id3v2

        m = parse_id3v2(
            make_id3v2({"TIT2": "Song ♪", "TPE1": "Circle", "TRCK": "7/12"})
        )
        assert (m["title"], m["artist"], m["track"]) == (
            "Song ♪", "Circle", "7/12"
        )
        assert m["version"] == 3

    @pytest.mark.parametrize("encoding", [0, 1, 2, 3])
    @pytest.mark.parametrize("version", [3, 4])
    def test_all_encodings_and_versions(self, encoding, version):
        from tlmc_etl_spark.functions.media import make_id3v2, parse_id3v2

        text = "Song" if encoding == 0 else "Søng ♪"
        m = parse_id3v2(
            make_id3v2({"TIT2": text}, version=version, encoding=encoding)
        )
        assert m["title"] == text and m["version"] == version

    def test_v23_unsynchronisation(self):
        from tlmc_etl_spark.functions.media import make_id3v2, parse_id3v2

        # UTF-16 text is full of 0xFF bytes — the unsync round-trip is
        # only exact if both sides apply the FF 00 stuffing rule
        m = parse_id3v2(
            make_id3v2({"TIT2": "ÿÿ high"}, version=3, encoding=1,
                       unsync=True)
        )
        assert m["title"] == "ÿÿ high"

    def test_padding_stops_walk(self):
        from tlmc_etl_spark.functions.media import make_id3v2, parse_id3v2

        m = parse_id3v2(make_id3v2({"TRCK": "3"}, padding=64))
        assert m["track"] == "3" and m["tags"] == {"TRCK": "3"}

    def test_v22_roundtrip(self):
        """ID3v2.2: 3-char frame IDs, 3-byte sizes, no frame flags —
        the layout older corpus MP3s carry, read transparently by the
        reference's mutagen path (info_scanner_ph2.py:138-170)."""
        from tlmc_etl_spark.functions.media import make_id3v2, parse_id3v2

        m = parse_id3v2(
            make_id3v2({"TT2": "Søng ♪", "TP1": "Circle", "TRK": "7/12"},
                       version=2, padding=16)
        )
        assert (m["title"], m["artist"], m["track"]) == (
            "Søng ♪", "Circle", "7/12"
        )
        assert m["version"] == 2
        # wrong id width for the version is a builder error
        with pytest.raises(ValueError, match="3 chars"):
            make_id3v2({"TIT2": "x"}, version=2)
        with pytest.raises(ValueError, match="4 chars"):
            make_id3v2({"TT2": "x"}, version=3)

    def test_v22_whole_tag_compression_skips_body(self):
        from tlmc_etl_spark.functions.media import make_id3v2, parse_id3v2

        t = bytearray(make_id3v2({"TT2": "x"}, version=2))
        t[5] |= 0x40  # v2.2 compression bit: no scheme defined — skip
        m = parse_id3v2(bytes(t))
        assert m["tags"] == {} and m["title"] is None

    def test_default_encoding_is_version_conformant(self):
        """UTF-8 (encoding 3) is v2.4-only: the default builder must
        emit latin-1 for ASCII text and UTF-16 BOM otherwise on
        v2.2/2.3, so real v2.3 readers accept the planted frames."""
        from tlmc_etl_spark.functions.media import make_id3v2

        def enc_byte(tag: bytes, fid: bytes, hdr: int) -> int:
            return tag[tag.find(fid) + hdr]

        assert enc_byte(make_id3v2({"TIT2": "plain"}), b"TIT2", 10) == 0
        assert enc_byte(make_id3v2({"TIT2": "東方"}), b"TIT2", 10) == 1
        assert enc_byte(
            make_id3v2({"TT2": "東方"}, version=2), b"TT2", 6
        ) == 1
        assert enc_byte(
            make_id3v2({"TIT2": "東方"}, version=4), b"TIT2", 10
        ) == 3

    def test_frame_walk_coexists(self):
        from tlmc_etl_spark.functions.media import (
            make_id3v2,
            make_mp3_stream,
            parse_id3v2,
            parse_mp3_frames,
        )

        s = make_id3v2({"TRCK": "9"}) + make_mp3_stream([(5, 0, 0), (5, 0, 0)])
        assert parse_id3v2(s)["track"] == "9"
        assert len(parse_mp3_frames(s)) == 2

    def test_strictness(self):
        import pytest

        from tlmc_etl_spark.functions.media import make_id3v2, parse_id3v2

        assert parse_id3v2(None) is None
        assert parse_id3v2(b"RIFF" + bytes(20)) is None
        t = make_id3v2({"TIT2": "x" * 40})
        with pytest.raises(ValueError):
            parse_id3v2(t[:-6])  # torn frame
        bad = bytearray(t)
        bad[3] = 5  # unknown future version
        with pytest.raises(ValueError, match="version"):
            parse_id3v2(bytes(bad))
        bad = bytearray(t)
        bad[bytes(t).find(b"TIT2") + 10] = 9  # bogus encoding byte
        with pytest.raises(ValueError, match="encoding"):
            parse_id3v2(bytes(bad))

    def test_random_bytes_never_leak(self):
        import numpy as np

        from tlmc_etl_spark.functions.media import parse_id3v2

        rng = np.random.default_rng(109)
        for _ in range(200):
            blob = b"ID3" + bytes(
                rng.integers(0, 256, size=int(rng.integers(0, 200)),
                             dtype=np.uint8)
            )
            try:
                parse_id3v2(blob)
            except ValueError:
                pass


class TestWvpkFraming:
    """WavPack block index (functions/media.py) — the .wv member of the
    framing family; layout from wavpack.com file_format.txt."""

    def test_block_walk_geometry(self):
        from tlmc_etl_spark.functions.media import (
            make_wvpk_stream,
            parse_wvpk_blocks,
        )

        s = make_wvpk_stream([3000, 3000, 1500], [100, 120, 80])
        b = parse_wvpk_blocks(s)
        assert [x["block_index"] for x in b] == [0, 3000, 6000]
        assert [x["block_samples"] for x in b] == [3000, 3000, 1500]
        assert [x["byte_length"] for x in b] == [132, 152, 112]
        assert b[0]["total_samples"] == 7500
        assert b[1]["total_samples"] is None  # only the first declares
        assert b[0]["byte_offset"] == 0
        assert b[1]["byte_offset"] == 132
        assert all(x["sample_rate"] == 44100 for x in b)
        assert all(x["channels"] == 2 for x in b)

    def test_hand_pinned_header_layout(self):
        """Literal 32-byte header written from the spec table — not
        builder output: ckSize excludes the first 8 bytes; flags bit 2
        = mono; bits 23-26 = sample-rate index (10 = 48000)."""
        import struct

        from tlmc_etl_spark.functions.media import parse_wvpk_blocks

        flags = 0x3 | (1 << 2) | (1 << 11) | (1 << 12) | (10 << 23)
        hdr = b"wvpk" + struct.pack(
            "<IHBBIIIII", 24 + 6, 0x407, 0, 0, 12345, 0, 12345, flags, 99
        ) + bytes(6)
        b = parse_wvpk_blocks(hdr)
        assert b == [{
            "idx": 0, "byte_offset": 0, "byte_length": 38,
            "block_index": 0, "block_samples": 12345,
            "sample_rate": 48000, "channels": 1,
            "total_samples": 12345, "crc": 99,
        }]

    def test_strictness(self):
        from tlmc_etl_spark.functions.media import (
            make_wvpk_stream,
            parse_wvpk_blocks,
        )

        assert parse_wvpk_blocks(None) == []
        assert parse_wvpk_blocks(b"") == []
        assert parse_wvpk_blocks(b"RIFF" + bytes(40)) == []
        s = make_wvpk_stream([2000, 2000], [60, 60])
        for cut in (len(s) - 1, len(s) // 2, 40, 10):
            with pytest.raises(ValueError):
                parse_wvpk_blocks(s[:cut])
        bad = bytearray(s)
        bad[92] ^= 0xFF  # second block's magic
        with pytest.raises(ValueError, match="sync"):
            parse_wvpk_blocks(bytes(bad))

    def test_random_bytes_never_leak(self):
        import numpy as np

        from tlmc_etl_spark.functions.media import parse_wvpk_blocks

        rng = np.random.default_rng(151)
        for _ in range(200):
            blob = b"wvpk" + bytes(
                rng.integers(0, 256, size=int(rng.integers(0, 120)),
                             dtype=np.uint8)
            )
            try:
                parse_wvpk_blocks(blob)
            except ValueError:
                pass


class TestM4aSampleIndex:
    """ISO BMFF sample tables (functions/media.py) — the .m4a member of
    the framing family."""

    def test_offsets_cover_the_mdat_contiguously(self):
        from tlmc_etl_spark.functions.media import (
            make_m4a,
            parse_m4a_sample_index,
        )

        sizes = [100 + i % 37 for i in range(50)]
        enc = make_m4a(sizes, samples_per_chunk=8)
        idx = parse_m4a_sample_index(enc)
        assert idx["timescale"] == 44100
        assert idx["duration"] == 50 * 1024
        assert idx["sample_sizes"] == sizes
        offs = idx["sample_offsets"]
        # contiguous inside AND across stco chunks (single mdat run)
        for i in range(49):
            assert offs[i + 1] == offs[i] + sizes[i]
        # offsets land on the mdat payload bytes the writer planted
        assert enc[offs[0]] == 3  # payload byte 0 = (11*0+3) % 256

    def test_stsc_runs_expand_correctly(self):
        """Multiple stsc runs (the general case): rebuild an archive
        whose chunks hold 4,4,2 samples via a hand-spliced stsc."""
        from tlmc_etl_spark.functions.media import (
            make_m4a,
            parse_m4a_sample_index,
        )

        # writer emits uniform spc; vary spc per call and cross-check
        for spc in (1, 3, 7, 50):
            sizes = [64 + i for i in range(10)]
            idx = parse_m4a_sample_index(make_m4a(sizes, samples_per_chunk=spc))
            offs = idx["sample_offsets"]
            assert idx["sample_sizes"] == sizes
            for i in range(9):
                assert offs[i + 1] == offs[i] + sizes[i]

    def test_strictness(self):
        from tlmc_etl_spark.functions.media import (
            make_m4a,
            parse_m4a_sample_index,
        )

        assert parse_m4a_sample_index(None) is None
        assert parse_m4a_sample_index(b"RIFF" + bytes(20)) is None
        enc = make_m4a([100] * 8, samples_per_chunk=4)
        for cut in (20, 120, 300, len(enc) - 50):
            with pytest.raises(ValueError):
                parse_m4a_sample_index(enc[:cut])
        # a declared sample that points past EOF must refuse
        bad = bytearray(enc)
        at = bad.find(b"stco") + 8  # verflags, then count
        import struct

        (n_chunks,) = struct.unpack_from(">I", bad, at)
        struct.pack_into(">I", bad, at + 4, len(enc) - 10)  # chunk 0 off
        with pytest.raises(ValueError, match="overruns"):
            parse_m4a_sample_index(bytes(bad))

    def test_random_boxes_never_leak(self):
        import numpy as np

        from tlmc_etl_spark.functions.media import parse_m4a_sample_index

        rng = np.random.default_rng(157)
        for _ in range(200):
            blob = bytes([0, 0, 0, 16]) + b"ftyp" + bytes(
                rng.integers(0, 256, size=int(rng.integers(0, 150)),
                             dtype=np.uint8)
            )
            try:
                parse_m4a_sample_index(blob)
            except ValueError:
                pass


class TestOggFraming:
    """Ogg page walk (functions/media.py) — RFC 3533 pages, Vorbis I /
    RFC 7845 identification headers; the .ogg/.opus members of the
    framing family."""

    def test_crc_matches_published_catalog_vector(self):
        # Same algorithm as CRC-32/POSIX (poly 0x04c11db7, init 0, no
        # reflection) minus the final XOR; the catalog check value for
        # "123456789" is 0x765e7680.
        from tlmc_etl_spark.functions.media import ogg_crc

        assert ogg_crc(b"123456789") ^ 0xFFFFFFFF == 0x765E7680

    def test_page_walk_geometry(self):
        from tlmc_etl_spark.functions.media import (
            make_ogg_stream,
            parse_ogg_pages,
        )

        s = make_ogg_stream("vorbis", [[100, 120], [90]], 2048, title="t0042")
        p = parse_ogg_pages(s)
        assert [x["page_seq"] for x in p] == [0, 1, 2, 3]
        assert [x["granule_pos"] for x in p] == [0, 0, 2048, 4096]
        # ID page: 27 hdr + 1 lacing + 30-byte Vorbis ID packet
        assert p[0]["byte_length"] == 58 and p[0]["bos"]
        # tag/setup page: 27 + 2 lacing + (39 comment + 72 setup)
        assert p[1]["byte_length"] == 140
        assert p[2]["byte_length"] == 27 + 2 + 100 + 120
        assert p[3]["eos"] and not p[0]["eos"]
        assert [x["n_packets"] for x in p] == [1, 2, 2, 1]
        offs = [x["byte_offset"] for x in p]
        assert offs == [0, 58, 198, 447]
        assert offs[-1] + p[-1]["byte_length"] == len(s)

    def test_stream_info_both_codecs(self):
        from tlmc_etl_spark.functions.media import (
            make_ogg_stream,
            parse_ogg_stream_info,
        )

        v = parse_ogg_stream_info(
            make_ogg_stream("vorbis", [[80]] * 4, 3072)
        )
        assert (v["codec"], v["sample_rate"], v["granule_rate"]) == (
            "vorbis", 44100, 44100,
        )
        assert v["pre_skip"] == 0 and v["n_samples"] == 4 * 3072
        o = parse_ogg_stream_info(
            make_ogg_stream("opus", [[80]] * 4, 2880, sample_rate=48000)
        )
        assert (o["codec"], o["granule_rate"], o["pre_skip"]) == (
            "opus", 48000, 312,
        )
        # Opus granules include pre-skip; PCM duration excludes it
        assert o["last_granule"] == 312 + 4 * 2880
        assert o["n_samples"] == 4 * 2880
        assert o["duration_s"] == round(4 * 2880 / 48000, 6)

    def test_granule_minus_one_final_page_uses_last_carrying_page(self):
        # RFC 3533 §6: granule_pos = -1 marks a page where no packet
        # completes; duration must come from the last page that CARRIES
        # a position, not read 0 samples off the -1.
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_ogg_page,
            make_ogg_stream,
            make_vorbis_id_packet,
            parse_ogg_stream_info,
        )

        base = make_ogg_stream("vorbis", [[80], [80]], 2048)
        # append a trailing -1 page (big packet whose tail never closes
        # here would be the real cause; a plain -1 page exercises the
        # same path)
        tail = make_ogg_page(0x1234, 4, -1, [bytes(10)], eos=True)
        info = parse_ogg_stream_info(base[: len(base) - 0] + tail)
        assert info["last_granule"] == 2 * 2048
        assert info["n_samples"] == 2 * 2048
        # a stream where NO page carries a position is an error, not a
        # silent zero-duration success
        all_blank = make_ogg_page(5, 0, -1, [make_vorbis_id_packet()], bos=True)
        all_blank += make_ogg_page(5, 1, -1, [bytes(8)], eos=True)
        with pytest.raises(ValueError, match="granule position"):
            parse_ogg_stream_info(all_blank)

    def test_continued_packet_lacing(self):
        from tlmc_etl_spark.functions.media import (
            make_ogg_page,
            parse_ogg_pages,
        )

        big = bytes(510)  # laces to [255, 255] with an open tail
        first = make_ogg_page(7, 0, 0, [bytes(10), big],
                              bos=True, open_tail=True)
        second = make_ogg_page(7, 1, 1000, [bytes(20), bytes(5)],
                               continued=True, eos=True)
        p = parse_ogg_pages(first + second)
        # page 0 completes only the 10-byte packet; the 510-byte tail
        # spills (two 255 lacing values, no terminator)
        assert p[0]["n_packets"] == 1 and p[0]["n_segments"] == 3
        assert p[0]["payload_len"] == 520
        assert p[1]["continued"] and p[1]["n_packets"] == 2

    def test_strictness(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_ogg_stream,
            parse_ogg_pages,
        )

        assert parse_ogg_pages(None) == []
        assert parse_ogg_pages(b"") == []
        assert parse_ogg_pages(b"RIFF" + bytes(40)) == []
        s = make_ogg_stream("opus", [[60], [70]], 960)
        pages = parse_ogg_pages(s)
        bounds = {p["byte_offset"] for p in pages} | {len(s)}
        for cut in range(1, len(s)):
            if cut < 4:
                assert parse_ogg_pages(s[:cut]) == []  # capture pattern torn
            elif cut in bounds:
                got = parse_ogg_pages(s[:cut])  # clean page prefix
                assert cut == got[-1]["byte_offset"] + got[-1]["byte_length"]
            else:
                with pytest.raises(ValueError):
                    parse_ogg_pages(s[:cut])
        bad = bytearray(s)
        bad[-1] ^= 0xFF  # payload corruption must fail the page CRC
        with pytest.raises(ValueError, match="CRC"):
            parse_ogg_pages(bytes(bad))

    def test_sequence_gap_detected(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_ogg_stream,
            parse_ogg_pages,
        )

        s = make_ogg_stream("vorbis", [[50], [50], [50]], 1024)
        pages = parse_ogg_pages(s)
        third = pages[2]
        torn = (
            s[: third["byte_offset"]]
            + s[third["byte_offset"] + third["byte_length"]:]
        )
        with pytest.raises(ValueError, match="sequence gap"):
            parse_ogg_pages(torn)

    def test_stream_info_contracts(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_ogg_page,
            parse_ogg_stream_info,
        )

        assert parse_ogg_stream_info(b"not ogg") is None
        assert parse_ogg_stream_info(None) is None
        no_bos = make_ogg_page(1, 0, 0, [b"\x01vorbis" + bytes(23)])
        with pytest.raises(ValueError, match="beginning-of-stream"):
            parse_ogg_stream_info(no_bos)
        alien = make_ogg_page(1, 0, 0, [b"theora-ish"], bos=True)
        with pytest.raises(ValueError, match="unknown codec"):
            parse_ogg_stream_info(alien)
        torn = make_ogg_page(1, 0, 0, [b"OpusHead\x01\x02"], bos=True)
        with pytest.raises(ValueError, match="torn OpusHead"):
            parse_ogg_stream_info(torn)

    def test_random_bytes_never_leak(self):
        import numpy as np

        from tlmc_etl_spark.functions.media import parse_ogg_pages

        rng = np.random.default_rng(163)
        for _ in range(200):
            blob = b"OggS" + bytes(
                rng.integers(0, 256, size=int(rng.integers(0, 160)),
                             dtype=np.uint8)
            )
            try:
                parse_ogg_pages(blob)
            except ValueError:
                pass


class TestOggComments:
    """Comment-packet tag channel (functions/media.py:parse_ogg_comments)
    — same list layout as FLAC's VORBIS_COMMENT, one shared parser."""

    def test_tags_roundtrip_both_codecs(self):
        from tlmc_etl_spark.functions.media import (
            make_ogg_stream,
            parse_ogg_comments,
        )

        v = parse_ogg_comments(make_ogg_stream(
            "vorbis", [[50]], 1024,
            tags=[("TITLE", "Foo"), ("Artist", "Bar ♪"),
                  ("TRACKNUMBER", "3/12")],
            vendor="xiph-ish 1.2",
        ))
        assert v["codec"] == "vorbis" and v["vendor"] == "xiph-ish 1.2"
        # keys lowercase; values verbatim incl. non-ASCII
        assert v["tags"] == {
            "title": "Foo", "artist": "Bar ♪", "tracknumber": "3/12",
        }
        o = parse_ogg_comments(make_ogg_stream(
            "opus", [[50]], 960, tags=[("title", "Baz")],
        ))
        assert o["codec"] == "opus" and o["tags"] == {"title": "Baz"}

    def test_default_stream_keeps_single_title(self):
        from tlmc_etl_spark.functions.media import (
            make_ogg_stream,
            parse_ogg_comments,
        )

        got = parse_ogg_comments(make_ogg_stream(
            "vorbis", [[40]], 1024, title="t0007"
        ))
        assert got["tags"] == {"title": "t0007"}

    def test_framing_bit_is_low_bit_not_exact_byte(self):
        # Vorbis I §5.2 mandates a NONZERO framing BIT — any final byte
        # with the low bit set is conformant (e.g. 0x81), and any with it
        # clear is torn, even if nonzero (0x80).
        import struct

        import pytest

        from tlmc_etl_spark.functions.media import (
            make_ogg_page,
            make_vorbis_id_packet,
            parse_ogg_comments,
        )

        vendor = b"v"
        body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 1)
        item = b"TITLE=x"
        body += struct.pack("<I", len(item)) + item

        def stream(framing: bytes) -> bytes:
            p0 = make_ogg_page(9, 0, 0, [make_vorbis_id_packet()], bos=True)
            p1 = make_ogg_page(9, 1, 0, [b"\x03vorbis" + body + framing])
            return p0 + p1

        assert parse_ogg_comments(stream(b"\x81"))["tags"] == {"title": "x"}
        assert parse_ogg_comments(stream(b"\x01"))["tags"] == {"title": "x"}
        with pytest.raises(ValueError, match="framing bit"):
            parse_ogg_comments(stream(b"\x80"))
        with pytest.raises(ValueError, match="framing bit"):
            parse_ogg_comments(stream(b"\x00"))

    def test_contracts(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_ogg_page,
            make_ogg_stream,
            make_vorbis_id_packet,
            parse_ogg_comments,
        )

        assert parse_ogg_comments(b"not ogg") is None
        assert parse_ogg_comments(None) is None
        # a bos page alone has no page_seq-1 comment header
        lone = make_ogg_page(3, 0, 0, [make_vorbis_id_packet()], bos=True)
        with pytest.raises(ValueError, match="no comment header"):
            parse_ogg_comments(lone)
        # second page whose packet is not a comment header
        bad = lone + make_ogg_page(3, 1, 0, [b"junk-payload"])
        with pytest.raises(ValueError, match="not a Vorbis comment"):
            parse_ogg_comments(bad)
        # torn comment list inside a CRC-valid page must still ValueError
        s = make_ogg_stream("vorbis", [[40]], 1024)
        torn = make_ogg_page(
            0x1234, 1, 0,
            [b"\x03vorbis" + b"\x40\x00\x00\x00" + b"v" * 5 + b"\x01"],
        )
        pages_0 = s[:58]
        with pytest.raises(ValueError, match="vendor overruns"):
            parse_ogg_comments(pages_0 + torn)


class TestOggMultiPageHeaders:
    """Real header packets span pages (large Vorbis setup codebooks,
    cover art in OpusTags) — packet extraction must reassemble across
    the continued-page chain, and the audio-packet count must not
    assume headers end on page 1."""

    def _spanning_opus(self):
        import struct

        from tlmc_etl_spark.functions.media import (
            make_ogg_page,
            make_opus_head,
        )

        vendor = b"v"
        art = b"A" * 600  # forces the tags packet past one page
        item = b"COVERISH=" + art
        tags_pkt = (
            b"OpusTags"
            + struct.pack("<I", len(vendor)) + vendor
            + struct.pack("<I", 1)
            + struct.pack("<I", len(item)) + item
        )
        # split so the first part laces to 255s only (multiple of 255)
        cut = 510
        pages = (
            make_ogg_page(9, 0, 0, [make_opus_head()], bos=True)
            + make_ogg_page(9, 1, 0, [tags_pkt[:cut]], open_tail=True)
            + make_ogg_page(9, 2, 0, [tags_pkt[cut:]], continued=True)
            + make_ogg_page(9, 3, 312 + 960, [bytes(40)], eos=True)
        )
        return pages, art

    def test_comments_reassemble_across_pages(self):
        from tlmc_etl_spark.functions.media import parse_ogg_comments

        data, art = self._spanning_opus()
        got = parse_ogg_comments(data)
        assert got["codec"] == "opus"
        assert got["tags"] == {"coverish": art.decode()}

    def test_audio_packet_count_ignores_header_span(self):
        from tlmc_etl_spark.functions.media import parse_ogg_stream_info

        data, _ = self._spanning_opus()
        info = parse_ogg_stream_info(data)
        # one audio packet, even though the OpusTags packet completes on
        # page 2 (a page-1-ends-the-headers assumption would count 2)
        assert info["n_audio_packets"] == 1
        assert info["n_samples"] == 960

    def test_continuation_mismatch_detected(self):
        import pytest

        from tlmc_etl_spark.functions.media import (
            make_ogg_page,
            make_opus_head,
            parse_ogg_comments,
        )

        # open tail on page 1 but page 2 does NOT set continued
        bad = (
            make_ogg_page(9, 0, 0, [make_opus_head()], bos=True)
            + make_ogg_page(9, 1, 0, [bytes(510)], open_tail=True)
            + make_ogg_page(9, 2, 960, [bytes(20)])
        )
        with pytest.raises(ValueError, match="continuation mismatch"):
            parse_ogg_comments(bad)
