"""The MERT-shaped embedding pipeline with the CPU stand-in featurizer:
decode -> chunk -> batch-infer -> journal, end-to-end in-sandbox (round-7
VERDICT #7). The stand-in is a real signal featurizer (log-mel energies
via rFFT), so the tests can assert SEMANTIC properties — a pure tone's
energy must land in the right mel band — not just plumbing shape."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.pipelines.mert_standin import (
    BATCH_SIZE,
    CHUNK_SECONDS,
    HOP_SECONDS,
    SAMPLE_RATE,
    audio_chunk_embeddings,
    chunk_samples,
    mel_embedding_batch,
    parse_wav,
    run_journaled_embedding_pass,
)


def _wav_bytes(samples: np.ndarray, sr: int = SAMPLE_RATE, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            w.writeframes((samples * 32767).astype("<i2").tobytes())
        else:
            w.writeframes((samples * 127 + 128).astype(np.uint8).tobytes())
    return buf.getvalue()


def _tone(freq: float, seconds: float, sr: int = SAMPLE_RATE) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    return 0.5 * np.sin(2 * np.pi * freq * t)


class TestKernel:
    def test_wav_roundtrip(self):
        x = _tone(440, 1.0)
        y, sr = parse_wav(_wav_bytes(x))
        assert sr == SAMPLE_RATE and len(y) == len(x)
        assert np.abs(y - x).max() < 1e-3  # 16-bit quantization only

    def test_chunking_contract(self):
        # 14 s at 6 s / 4 s hop -> [0,6) [4,10) [8,14): 3 chunks cover
        # everything exactly, no tail
        assert chunk_samples(_tone(440, 14.0), SAMPLE_RATE).shape[0] == 3
        # 15 s -> the last second needs a padded tail chunk at 12 s:
        # nothing may be dropped
        x = _tone(440, 15.0)
        m = chunk_samples(x, SAMPLE_RATE)
        assert m.shape == (4, int(CHUNK_SECONDS * SAMPLE_RATE))
        hop = int(HOP_SECONDS * SAMPLE_RATE)
        assert np.array_equal(m[1], x[hop : hop + m.shape[1]])
        tail = x[3 * hop :]
        assert np.array_equal(m[3, : len(tail)], tail)
        assert (m[3, len(tail) :] == 0).all()

    def test_short_track_is_one_padded_chunk(self):
        m = chunk_samples(_tone(440, 1.0), SAMPLE_RATE)
        assert m.shape[0] == 1

    def test_tone_energy_lands_in_right_mel_band(self):
        # 200 Hz vs 8 kHz tones must peak in different bands, low tone in
        # a lower band — the featurizer is a real spectral kernel, not a
        # hash fake
        lo = mel_embedding_batch(chunk_samples(_tone(200, 6.0), SAMPLE_RATE), SAMPLE_RATE)
        hi = mel_embedding_batch(chunk_samples(_tone(8000, 6.0), SAMPLE_RATE), SAMPLE_RATE)
        assert np.argmax(lo[0]) < np.argmax(hi[0])

    def test_embeddings_unit_norm_and_deterministic(self):
        m = chunk_samples(_tone(440, 10.0), SAMPLE_RATE)
        a = mel_embedding_batch(m, SAMPLE_RATE)
        b = mel_embedding_batch(m, SAMPLE_RATE)
        assert np.array_equal(a, b)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


@pytest.fixture(scope="module")
def audio_df(spark):
    rows = [
        ("t1", _wav_bytes(_tone(220, 9.0))),   # 2 chunks
        ("t2", _wav_bytes(_tone(880, 15.0))),  # 4 chunks (3 full + padded tail)
        ("t3", _wav_bytes(_tone(3520, 3.0))),  # 1 padded chunk
    ]
    return spark.createDataFrame(rows, "track_id string, payload binary")


class TestPipeline:
    def test_chunk_counts_and_schema(self, spark, audio_df):
        out = audio_chunk_embeddings(audio_df).collect()
        by_track = {}
        for r in out:
            by_track.setdefault(r["track_id"], []).append(r)
            assert len(r["embedding"]) == 16
            assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-9
        assert {t: len(v) for t, v in by_track.items()} == {"t1": 2, "t2": 4, "t3": 1}
        for t, rows in by_track.items():
            assert sorted(r["chunk_idx"] for r in rows) == list(range(len(rows)))
            assert all(r["n_chunks"] == len(rows) for r in rows)

    def test_batch_collate_spans_track_boundaries(self, spark):
        # 70 one-chunk tracks > BATCH_SIZE forces at least two inference
        # batches, the second spanning the 64-track boundary — results
        # must be identical to per-track singles (collate is invisible)
        rows = [
            (f"t{i:03d}", _wav_bytes(_tone(200 + 17 * i, 2.0)))
            for i in range(BATCH_SIZE + 6)
        ]
        df = spark.createDataFrame(rows, "track_id string, payload binary")
        got = {
            r["track_id"]: np.array(r["embedding"])
            for r in audio_chunk_embeddings(df).collect()
        }
        assert len(got) == BATCH_SIZE + 6
        for tid, payload in rows[:3] + rows[-3:]:
            x, sr = parse_wav(payload)
            want = mel_embedding_batch(chunk_samples(x, sr), sr)[0]
            assert np.allclose(got[tid], want, atol=1e-12)

    def test_journaled_run_is_incremental_and_idempotent(self, spark, audio_df, tmp_path):
        out_dir, j_dir = str(tmp_path / "emb"), str(tmp_path / "journal")
        n1 = run_journaled_embedding_pass(spark, audio_df, out_dir, j_dir)
        assert n1 == 3
        assert spark.read.parquet(out_dir).count() == 7  # 2 + 4 + 1 chunks
        # rerun: journal already covers everything — nothing reprocessed
        assert run_journaled_embedding_pass(spark, audio_df, out_dir, j_dir) == 0
        assert spark.read.parquet(out_dir).count() == 7
        # a new track processes alone; existing rows untouched
        more = audio_df.unionByName(
            spark.createDataFrame(
                [("t4", _wav_bytes(_tone(110, 7.0)))],
                "track_id string, payload binary",
            )
        )
        assert run_journaled_embedding_pass(spark, more, out_dir, j_dir) == 1
        final = spark.read.parquet(out_dir)
        assert final.filter(F.col("track_id") == "t4").count() == 2
        assert final.count() == 9

    def test_mixed_rates_each_use_their_own_filterbank(self, spark):
        # per-rate collate buffers: a mixed-rate corpus featurizes each
        # track against ITS OWN rate's filterbank regardless of which
        # partition or Arrow batch rows land in (coalesce(1) forces the
        # hardest case — both rates in one task)
        rows = [
            ("a", _wav_bytes(_tone(440, 2.0), sr=SAMPLE_RATE)),
            ("b", _wav_bytes(_tone(440, 2.0, sr=16000), sr=16000)),
        ]
        df = spark.createDataFrame(
            rows, "track_id string, payload binary"
        ).coalesce(1)
        got = {
            r["track_id"]: np.array(r["embedding"])
            for r in audio_chunk_embeddings(df).collect()
        }
        for tid, payload in rows:
            x, sr = parse_wav(payload)
            want = mel_embedding_batch(chunk_samples(x, sr), sr)[0]
            assert np.allclose(got[tid], want, atol=1e-12), tid

    def test_quiet_int32_wav_decodes_correctly(self):
        # regression: a -40 dBFS int32 track must decode to the signal,
        # not be misread as float32 garbage by an amplitude heuristic
        import struct

        x = _tone(440, 0.5) * 0.01  # quiet master
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(4)
            w.setframerate(SAMPLE_RATE)
            w.writeframes((x * 2147483647).astype("<i4").tobytes())
        y, sr = parse_wav(buf.getvalue())
        assert sr == SAMPLE_RATE
        assert np.abs(y - x).max() < 1e-8


def _riff(fmt_tag: int, n_ch: int, sr: int, bits: int, data: bytes,
          extensible: bool = False) -> bytes:
    """Hand-built RIFF/WAVE container (independent of stdlib wave)."""
    import struct

    if extensible:
        # cbSize=22, valid bits, channel mask, SubFormat GUID with the
        # real format code in its leading 2 bytes
        ext = struct.pack("<HHI", 22, bits, 0x4) + struct.pack(
            "<H", fmt_tag
        ) + bytes.fromhex("000000001000800000aa00389b71")
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, n_ch, sr, sr * n_ch * bits // 8,
            n_ch * bits // 8, bits,
        ) + ext
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_tag, n_ch, sr, sr * n_ch * bits // 8,
            n_ch * bits // 8, bits,
        )
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"  # word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestWavFormats:
    """The round-12 RIFF walk: IEEE-float, 24-bit and extensible WAVs —
    the master formats the stdlib `wave` module rejects — must decode
    exactly; integer-vs-float comes from the format TAG."""

    def test_float32_and_float64_decode_exactly(self):
        x = (_tone(440, 0.25)).astype(np.float32)
        y, sr = parse_wav(_riff(3, 1, SAMPLE_RATE, 32, x.tobytes()))
        assert sr == SAMPLE_RATE and np.array_equal(y, x.astype(np.float64))
        x64 = _tone(330, 0.25)
        y, _ = parse_wav(_riff(3, 1, SAMPLE_RATE, 64, x64.tobytes()))
        assert np.array_equal(y, x64)

    def test_24bit_pcm_decodes_exactly(self):
        import struct

        vals = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321])
        raw = b"".join(
            struct.pack("<i", int(v) << 8)[1:] for v in vals  # 3 LE bytes
        )
        y, _ = parse_wav(_riff(1, 1, 44100, 24, raw))
        assert np.array_equal(y * 8388608.0, vals.astype(np.float64))

    def test_extensible_float_and_stereo_downmix(self):
        left = np.array([0.5, -0.25, 0.125], dtype=np.float32)
        right = np.array([0.25, 0.25, -0.125], dtype=np.float32)
        inter = np.stack([left, right], axis=1).reshape(-1)
        y, _ = parse_wav(_riff(3, 2, 48000, 32, inter.tobytes(),
                               extensible=True))
        want = (left.astype(np.float64) + right.astype(np.float64)) / 2
        assert np.allclose(y, want, atol=1e-12)

    def test_strictness(self):
        import pytest

        with pytest.raises(ValueError, match="format tag"):
            parse_wav(_riff(2, 1, 44100, 16, bytes(4)))  # ADPCM
        with pytest.raises(ValueError, match="frames"):
            parse_wav(_riff(1, 2, 44100, 16, bytes(6)))  # torn frame
        with pytest.raises(ValueError, match="fmt or data"):
            parse_wav(b"RIFF" + bytes([4, 0, 0, 0]) + b"WAVE")
        with pytest.raises(ValueError, match="overruns"):
            full = _riff(1, 1, 44100, 16, bytes(400))
            parse_wav(full[: len(full) - 100])


class TestFlacLane:
    """The embedding lane on FLAC-sourced PCM: a real codec decode
    (operators/flac.py) feeding the same chunk → collate → mel path."""

    def test_flac_tone_energy_lands_in_right_mel_band(self):
        from tlmc_etl_spark.pipelines.mert_standin import (
            decode_audio_payload,
            synth_tone_flac,
        )

        lo_x, sr = decode_audio_payload(synth_tone_flac(200, 6.0))
        hi_x, _ = decode_audio_payload(synth_tone_flac(8000, 6.0))
        assert sr == SAMPLE_RATE
        lo = mel_embedding_batch(chunk_samples(lo_x, sr), sr)
        hi = mel_embedding_batch(chunk_samples(hi_x, sr), sr)
        assert int(np.argmax(lo[0])) < int(np.argmax(hi[0]))

    def test_flac_and_wav_tones_embed_identically(self):
        # same generator samples through both codecs -> identical PCM
        # (FLAC is lossless; WAV is the raw container), so embeddings
        # must match to float precision
        from tlmc_etl_spark.pipelines.mert_standin import (
            decode_audio_payload,
            synth_tone_flac,
            synth_tone_wav,
        )

        fx, fsr = decode_audio_payload(synth_tone_flac(440, 2.0))
        wx, wsr = decode_audio_payload(synth_tone_wav(440, 2.0))
        assert fsr == wsr and len(fx) == len(wx)
        # synth_tone_wav rounds via astype (truncation) against
        # synth_tone_flac's identical astype: bit-equal integers
        assert np.array_equal((fx * 32768).round(), (wx * 32768).round())

    def test_pipeline_on_flac_payloads(self, spark):
        from tlmc_etl_spark.pipelines.mert_standin import (
            audio_chunk_embeddings,
            synth_tone_flac,
        )

        df = spark.createDataFrame(
            [
                ("f1", synth_tone_flac(220, 9.0)),
                ("f2", synth_tone_flac(880, 15.0)),
            ],
            "track_id string, payload binary",
        )
        out = audio_chunk_embeddings(df).collect()
        counts = {}
        for r in out:
            counts[r.track_id] = r.n_chunks
            assert abs(np.linalg.norm(r.embedding) - 1.0) < 1e-9
        assert counts == {"f1": 2, "f2": 4}

    def test_non_audio_payload_raises(self):
        import pytest

        from tlmc_etl_spark.pipelines.mert_standin import decode_audio_payload

        with pytest.raises(ValueError, match="neither FLAC nor RIFF"):
            decode_audio_payload(b"\x00\x01\x02\x03" + bytes(64))
