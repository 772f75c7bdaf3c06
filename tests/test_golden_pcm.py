"""Golden-PCM fixtures for the ffmpeg decode lane (round-13 VERDICT #4).

The engine's entropy-codec PCM decode rides ffmpeg when present
(operators/multimodal._decode_audio_ffmpeg — the reference does the same,
mert_batched_uuid.py / loader.py:113-146). Everywhere ffmpeg exists these
fixtures turn that lane's smoke checks into VALUE checks: spec-built
silent MP3 / AAC-LC streams whose golden PCM is exactly zero, committed
under fixtures/golden_pcm/ and pinned byte-for-byte against the builders.

Vorbis/Opus carry no golden by design: Vorbis needs hand-built codebook
headers (unverifiable in-container — COVERAGE.md's sourcing analysis) and
Opus "silence" is decoder comfort-noise, implementation- not spec-pinned.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

from tlmc_etl_spark.functions.media import (
    parse_adts_frames,
    parse_mp3_frames,
    silent_aac_adts_frames,
    silent_mp3_frames,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "fixtures", "golden_pcm")
MP3_PATH = os.path.join(GOLDEN, "silence_44k_mono.mp3")
AAC_PATH = os.path.join(GOLDEN, "silence_44k_mono.aac")
MP3_FRAMES, AAC_FRAMES = 20, 40

needs_ffmpeg = pytest.mark.skipif(
    shutil.which("ffmpeg") is None, reason="real ffmpeg not on PATH"
)


def test_committed_fixtures_match_the_builders():
    # the committed bytes ARE the golden: a builder change that silently
    # alters the bitstream fails here, not in a skipped ffmpeg test
    assert open(MP3_PATH, "rb").read() == silent_mp3_frames(MP3_FRAMES)
    assert open(AAC_PATH, "rb").read() == silent_aac_adts_frames(AAC_FRAMES)


def test_mp3_golden_structure_via_in_repo_indexer():
    frames = parse_mp3_frames(open(MP3_PATH, "rb").read())
    assert len(frames) == MP3_FRAMES
    for f in frames:
        assert f["sample_rate"] == 44100
        assert f["channels"] == 1
        assert f["byte_length"] == 104
        assert f["main_data_begin"] == 0  # no bit reservoir in silence
    assert sum(f["n_samples"] for f in frames) == MP3_FRAMES * 1152


def test_aac_golden_structure_via_in_repo_indexer():
    frames = parse_adts_frames(open(AAC_PATH, "rb").read())
    assert len(frames) == AAC_FRAMES
    for f in frames:
        assert f["sample_rate"] == 44100
        assert f["channels"] == 1
        assert f["n_blocks"] == 1
    assert sum(f["n_samples"] for f in frames) == AAC_FRAMES * 1024


def _ffmpeg_pcm(path: str) -> np.ndarray:
    r = subprocess.run(
        ["ffmpeg", "-hide_banner", "-v", "error", "-i", path,
         "-f", "f32le", "-ac", "1", "-"],
        capture_output=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr.decode()[:400]
    return np.frombuffer(r.stdout, dtype="<f4")


@needs_ffmpeg
@pytest.mark.parametrize(
    "path,n_frames,spf",
    [(MP3_PATH, MP3_FRAMES, 1152), (AAC_PATH, AAC_FRAMES, 1024)],
)
def test_real_ffmpeg_decodes_golden_to_exact_silence(path, n_frames, spf):
    """The value check the smoke tests couldn't make: every output sample
    must be EXACTLY zero (a channel-map, resample or gain bug in the lane
    yields nonzero or wrong-length PCM), and the sample count must sit
    within one codec-delay window of n_frames * samples_per_frame."""
    pcm = _ffmpeg_pcm(path)
    assert pcm.size > 0
    assert np.all(pcm == 0.0), f"nonzero samples: max |v| = {np.abs(pcm).max()}"
    expected = n_frames * spf
    # decoders may trim/prepend up to ~2 frames of codec delay; silence
    # makes the content assertion exact regardless
    assert abs(pcm.size - expected) <= 2 * spf, (pcm.size, expected)


@needs_ffmpeg
@pytest.mark.parametrize("path", [MP3_PATH, AAC_PATH])
def test_decode_audio_lane_feature_is_zero_vector_on_golden(path):
    from tlmc_etl_spark.operators.multimodal import _decode_audio_ffmpeg

    feat = _decode_audio_ffmpeg(open(path, "rb").read())
    assert np.all(feat == 0.0), "RMS envelope of digital silence must be 0"
