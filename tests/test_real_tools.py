"""Opt-in passthrough tests against REAL ffprobe/ffmpeg/7z.

The subprocess operators are normally driven by the fake tools
(tools/fake_ffprobe, fake_ffmpeg, fake_7z) whose argv and output
contracts mirror the real binaries — but only a run against the real
tools can catch argv/parse drift no fake can (the fake asserts the
contract we REMEMBER, the real tool asserts the contract that IS).
Reference contracts: Shared/utils.py:80-113 (ffprobe JSON),
loudness_measure.py:111-143 (ebur128 stderr summary),
extract_plan.py:99-116 (7z -slt listing).

Each test skips cleanly when its binary is absent from PATH (this
container has none of them); on a host with real tools they exercise
the DEFAULT argv constants (FFPROBE_CMD / FFMPEG_EBUR128_CMD /
SEVEN_ZIP_CMD) — the exact command production runs — against tiny
generated fixtures (a stdlib-`wave` WAV; a 7z-created archive).
"""

from __future__ import annotations

import math
import shutil
import struct
import subprocess
import wave

import pytest

needs_ffprobe = pytest.mark.skipif(
    shutil.which("ffprobe") is None, reason="real ffprobe not on PATH"
)
needs_ffmpeg = pytest.mark.skipif(
    shutil.which("ffmpeg") is None, reason="real ffmpeg not on PATH"
)
needs_7z = pytest.mark.skipif(
    shutil.which("7z") is None, reason="real 7z not on PATH"
)


def _write_sine_wav(path: str, seconds: float = 0.5, rate: int = 44100) -> None:
    """A 440 Hz stereo 16-bit sine at ~-6 dBFS — loud enough that ebur128
    measures finite I/LRA/peak (digital silence would be -inf/gated)."""
    n = int(seconds * rate)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        amp = int(0.5 * 32767)
        frames = bytearray()
        for t in range(n):
            s = int(amp * math.sin(2 * math.pi * 440 * t / rate))
            frames += struct.pack("<hh", s, s)
        w.writeframes(bytes(frames))


@needs_ffprobe
def test_real_ffprobe_probes_generated_wav(spark, tmp_path):
    from tlmc_etl_spark.operators.process import probe_media_paths

    wav = str(tmp_path / "tone.wav")
    _write_sine_wav(wav)
    files = spark.createDataFrame([(wav,)], "path string")
    rows = probe_media_paths(files).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ok"], r["reason"]
    assert r["codec"] == "pcm_s16le"
    assert r["sample_rate"] == 44100
    assert r["channels"] == 2
    assert abs(r["duration_s"] - 0.5) < 0.05


@needs_ffprobe
def test_real_ffprobe_isolates_corrupt_file(spark, tmp_path):
    from tlmc_etl_spark.operators.process import probe_media_paths

    good = str(tmp_path / "good.wav")
    _write_sine_wav(good)
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"not a riff header at all")
    files = spark.createDataFrame([(good,), (bad,)], "path string")
    rows = {r["path"]: r for r in probe_media_paths(files).collect()}
    assert rows[good]["ok"]
    assert not rows[bad]["ok"] and rows[bad]["reason"].startswith("exit_")


@needs_ffmpeg
def test_real_ffmpeg_ebur128_measures_wav(spark, tmp_path):
    from tlmc_etl_spark.operators.process import measure_loudness_paths

    wav = str(tmp_path / "tone.wav")
    _write_sine_wav(wav, seconds=1.0)
    files = spark.createDataFrame([(wav,)], "path string")
    rows = measure_loudness_paths(files).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ok"], r["reason"]
    # a -6 dBFS sine measures around -9..-5 LUFS integrated; the point is
    # a FINITE parse through the real stderr format, not the exact figure
    assert r["i"] is not None and -70.0 < r["i"] < 0.0
    assert r["tp"] is not None and -20.0 < r["tp"] <= 3.0


@needs_ffmpeg
def test_real_ffmpeg_decodes_audio_payload_feature(spark, tmp_path):
    """The multimodal decode boundary runs on REAL media when ffmpeg is
    present: a WAV payload flows through extract_features' mapInPandas
    exactly like the synthetic kind — same schema, same batch shape."""
    from tlmc_etl_spark.operators.multimodal import FEATURE_DIM, extract_features

    wav = tmp_path / "tone.wav"
    _write_sine_wav(str(wav))
    payload = wav.read_bytes()
    media = spark.createDataFrame(
        [("m1", "audio", bytearray(payload))],
        "media_id string, kind string, payload binary",
    )
    rows = extract_features(media).collect()
    assert len(rows) == 1
    feat = rows[0]["feature"]
    assert len(feat) == FEATURE_DIM
    assert abs(sum(x * x for x in feat) - 1.0) < 1e-6  # unit-norm envelope


@needs_ffmpeg
def test_real_ffmpeg_decodes_video_payload_feature(spark, tmp_path):
    """The video arm runs on REAL media when ffmpeg is present: a Y4M
    payload (which ffmpeg itself demuxes — pipe:0 in, rawvideo gray out)
    flows through extract_features' mapInPandas like every other kind."""
    import numpy as np

    from tlmc_etl_spark.operators.multimodal import FEATURE_DIM, extract_features
    from tests.test_multimodal import _y4m_bytes

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, size=(16, 16), dtype=np.uint8) for _ in range(4)]
    media = spark.createDataFrame(
        [("v1", "video", bytearray(_y4m_bytes(frames)))],
        "media_id string, kind string, payload binary",
    )
    rows = extract_features(media).collect()
    assert len(rows) == 1
    feat = rows[0]["feature"]
    assert len(feat) == FEATURE_DIM
    assert abs(sum(x * x for x in feat) - 1.0) < 1e-6


@needs_7z
def test_real_7z_lists_created_archive(spark, tmp_path):
    from tlmc_etl_spark.operators.archive import list_archives

    src = tmp_path / "tree"
    (src / "disc1").mkdir(parents=True)
    (src / "disc1" / "a.txt").write_text("aa")
    (src / "b.txt").write_text("bb")
    arc = str(tmp_path / "rel.7z")
    subprocess.run(
        ["7z", "a", arc, str(src / "disc1"), str(src / "b.txt")],
        capture_output=True,
        check=True,
    )
    archives = spark.createDataFrame([(arc,)], "path string")
    rows = [r for r in list_archives(archives).collect() if r["ok"]]
    entries = {r["entry"]: r["is_dir"] for r in rows}
    assert any(e.endswith("a.txt") and not d for e, d in entries.items())
    assert any(e.endswith("b.txt") and not d for e, d in entries.items())
    assert any(e.endswith("disc1") and d for e, d in entries.items())


@needs_7z
def test_real_7z_archive_parses_with_inproc_index(tmp_path):
    """Cross-engine gate for the in-container header parser: an archive
    written by REAL `7z a` (LZMA-encoded header, solid folder) must
    yield the same names/dirs/sizes through parse_7z_index as through
    `7z l -slt` — breaking the encode_7z<->parse_7z_index
    self-consistency loop."""
    from tlmc_etl_spark.operators.sevenzip import parse_7z_index

    src = tmp_path / "tree"
    (src / "disc1").mkdir(parents=True)
    (src / "disc1" / "a.txt").write_text("aa" * 50)
    (src / "b.txt").write_text("bb")
    arc = str(tmp_path / "real.7z")
    subprocess.run(
        ["7z", "a", arc, str(src / "disc1"), str(src / "b.txt")],
        capture_output=True,
        check=True,
    )
    with open(arc, "rb") as fh:
        idx = parse_7z_index(fh.read())
    by_tail = {e["path"].rsplit("/", 1)[-1]: e for e in idx}
    assert by_tail["a.txt"]["size"] == 100 and not by_tail["a.txt"]["is_dir"]
    assert by_tail["b.txt"]["size"] == 2 and not by_tail["b.txt"]["is_dir"]
    assert by_tail["disc1"]["is_dir"]


@needs_7z
def test_real_7z_lists_spec_built_archive(tmp_path):
    """The converse gate: encode_7z output must be listable by REAL 7z
    (exit 0, same entry set)."""
    from tlmc_etl_spark.operators.archive import parse_slt
    from tlmc_etl_spark.operators.sevenzip import encode_7z

    for codec in ("copy", "lzma"):
        for solid in (False, True):
            arc = str(tmp_path / f"spec_{codec}_{solid}.7z")
            with open(arc, "wb") as fh:
                fh.write(
                    encode_7z(
                        [
                            ("Alb", True, None),
                            ("Alb/01.flac", False, b"fLaC" + bytes(64)),
                            ("Alb/02.flac", False, b"fLaC" + bytes(32)),
                        ],
                        header_codec=codec,
                        solid=solid,
                        mtime_unix=1_600_000_000,
                    )
                )
            r = subprocess.run(
                ["7z", "l", "-slt", arc], capture_output=True, check=True
            )
            entries = dict(parse_slt(r.stdout))
            assert entries == {
                "Alb": True, "Alb/01.flac": False, "Alb/02.flac": False
            }
            rc = subprocess.run(["7z", "t", arc], capture_output=True)
            assert rc.returncode == 0, rc.stdout + rc.stderr


@needs_7z
def test_real_7z_lists_spec_built_zip_and_rar(tmp_path):
    """Real 7z (which reads zip and rar natively) must list the
    spec-built ZIP and RAR containers to the same entry set — the
    external gate for the magic-dispatch family."""
    from tlmc_etl_spark.operators.archive import parse_slt
    from tlmc_etl_spark.operators.rarindex import encode_rar4, encode_rar5
    from tlmc_etl_spark.operators.zipindex import encode_zip

    entries = [
        ("Alb", True, None),
        ("Alb/01.flac", False, b"fLaC" + bytes(64)),
        ("Alb/02.flac", False, b"fLaC" + bytes(32)),
    ]
    want = {"Alb": True, "Alb/01.flac": False, "Alb/02.flac": False}
    blobs = {
        "a.zip": encode_zip(entries),
        "a64.zip": encode_zip(entries, zip64=True),
        "a5.rar": encode_rar5(entries, mtime_unix=1_600_000_000),
        "a4.rar": encode_rar4(entries),
    }
    for fname, blob in blobs.items():
        arc = str(tmp_path / fname)
        with open(arc, "wb") as fh:
            fh.write(blob)
        r = subprocess.run(["7z", "l", "-slt", arc], capture_output=True)
        assert r.returncode == 0, (fname, r.stdout + r.stderr)
        assert dict(parse_slt(r.stdout)) == want, fname


@needs_ffmpeg
def test_real_ffmpeg_agrees_with_stdlib_jpeg_codec(tmp_path):
    """Breaks the encoder<->decoder self-consistency loop: the
    hand-built test encoder's JPEG must decode to the same pixels
    through REAL ffmpeg as through operators/jpeg.py (a shared spec
    misreading on both in-repo sides — wrong zigzag, wrong predictor —
    would survive the in-container tests but not a third-party
    decoder)."""
    import numpy as np

    from test_jpeg import encode_gray_jpeg
    from tlmc_etl_spark.operators.jpeg import parse_jpeg_luma

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(24, 16)).astype(np.float64)
    payload = encode_gray_jpeg(img)
    ours = parse_jpeg_luma(payload)

    jpg = tmp_path / "x.jpg"
    jpg.write_bytes(payload)
    r = subprocess.run(
        [
            "ffmpeg", "-hide_banner", "-v", "error", "-i", str(jpg),
            "-f", "rawvideo", "-pix_fmt", "gray", "-",
        ],
        capture_output=True,
        timeout=60,
    )
    assert r.returncode == 0, r.stderr.decode()[:300]
    theirs = np.frombuffer(r.stdout, dtype=np.uint8).reshape(24, 16).astype(np.float64)
    # libjpeg's integer IDCT differs from the exact float transform by a
    # couple of code values per pixel
    assert np.abs(ours - theirs).max() <= 3.0


@needs_ffmpeg
def test_real_ffmpeg_agrees_with_stdlib_png_variants(tmp_path):
    """Breaks the PNG encoder<->decoder self-consistency loop for the
    round-12 arms: 16-bit and Adam7-interlaced streams built by
    encode_gray_png must decode to the exact pixels through REAL ffmpeg
    (PNG is lossless — a shared Adam7 pass-grid or byte-order
    misreading on both in-repo sides would survive the in-container
    tests but not a third-party decoder)."""
    import numpy as np

    from tlmc_etl_spark.operators.multimodal import encode_gray_png

    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, size=(17, 23)).astype(np.float64)
    cases = {
        "i8.png": (encode_gray_png(img, interlace=1), "gray", np.uint8, 1.0),
        "d16.png": (encode_gray_png(img * 257, depth=16), "gray16be",
                    np.dtype(">u2"), 257.0),
        "i16.png": (encode_gray_png(img * 257, depth=16, interlace=1),
                    "gray16be", np.dtype(">u2"), 257.0),
    }
    for fname, (payload, pix_fmt, dtype, scale) in cases.items():
        f = tmp_path / fname
        f.write_bytes(payload)
        r = subprocess.run(
            [
                "ffmpeg", "-hide_banner", "-v", "error", "-i", str(f),
                "-f", "rawvideo", "-pix_fmt", pix_fmt, "-",
            ],
            capture_output=True,
            timeout=60,
        )
        assert r.returncode == 0, (fname, r.stderr.decode()[:300])
        theirs = np.frombuffer(r.stdout, dtype=dtype).reshape(17, 23)
        assert np.array_equal(theirs.astype(np.float64) / scale, img), fname


@needs_ffmpeg
def test_real_ffmpeg_agrees_with_stdlib_gif_codec(tmp_path):
    """Breaks the GIF LZW encoder<->decoder self-consistency loop: a
    stream built by encode_gray_gif must decode to the exact pixels
    through REAL ffmpeg, in both row layouts (a shared width-growth or
    interlace-pass misreading would survive the in-container tests)."""
    import numpy as np

    from tlmc_etl_spark.operators.multimodal import encode_gray_gif

    rng = np.random.default_rng(73)
    img = rng.integers(0, 256, size=(19, 13)).astype(np.float64)
    for fname, payload in (
        ("plain.gif", encode_gray_gif(img)),
        ("interlaced.gif", encode_gray_gif(img, interlace=True)),
    ):
        f = tmp_path / fname
        f.write_bytes(payload)
        r = subprocess.run(
            [
                "ffmpeg", "-hide_banner", "-v", "error", "-i", str(f),
                "-f", "rawvideo", "-pix_fmt", "gray", "-",
            ],
            capture_output=True,
            timeout=60,
        )
        assert r.returncode == 0, (fname, r.stderr.decode()[:300])
        theirs = np.frombuffer(r.stdout, dtype=np.uint8).reshape(19, 13)
        assert np.array_equal(theirs.astype(np.float64), img), fname


@needs_ffmpeg
def test_real_ffmpeg_decodes_our_flac(tmp_path):
    """Breaks the FLAC encoder<->decoder self-consistency loop: streams
    built by encode_flac must decode to the EXACT input samples through
    real ffmpeg (FLAC is lossless, so unlike the JPEG cross-check there
    is no tolerance — any header/CRC/Rice/predictor misreading shared
    by both in-repo sides shows up as a hard mismatch or a decoder
    error here)."""
    import numpy as np

    from tlmc_etl_spark.operators.flac import encode_flac

    rng = np.random.default_rng(37)
    x = (np.arange(5000) % 257) * 3 + rng.integers(-5, 6, 5000)
    st = np.stack([x, (x // 2) + rng.integers(-3, 4, 5000)], axis=1).astype(
        np.int64
    )
    for kw in (
        {"mode": "auto", "stereo": "independent"},
        {"mode": "auto", "stereo": "mid_side", "partition_order": 2},
        {"mode": "lpc", "stereo": "left_side", "lpc_order": 8},
        {"mode": "lpc", "stereo": "right_side", "lpc_order": 4},
    ):
        f = tmp_path / "x.flac"
        f.write_bytes(encode_flac(st, 44100, block_size=1024, **kw))
        r = subprocess.run(
            [
                "ffmpeg", "-hide_banner", "-v", "error", "-i", str(f),
                "-f", "s16le", "-",
            ],
            capture_output=True,
            timeout=60,
        )
        assert r.returncode == 0, (kw, r.stderr.decode()[:300])
        theirs = np.frombuffer(r.stdout, dtype="<i2").reshape(-1, 2)
        assert np.array_equal(theirs, st), kw


@needs_ffmpeg
def test_real_ffmpeg_agrees_with_color_jpeg_codec(tmp_path):
    """Colour twin of the gray cross-check: our baseline colour JPEG
    must decode to the same RGB through real ffmpeg as through
    parse_jpeg_rgb. Solid-colour MCUs keep every chroma-upsampling
    filter equivalent (libjpeg's fancy upsampling interpolates BETWEEN
    chroma samples, which only differs where chroma varies)."""
    import numpy as np

    from tlmc_etl_spark.operators.jpeg import (
        encode_color_jpeg,
        encode_color_progressive,
        parse_jpeg_rgb,
    )

    rgb = np.zeros((32, 32, 3))
    rgb[:16] = (200, 30, 90)
    rgb[16:] = (10, 180, 250)
    cases = [
        (enc, sampling)
        for enc in (encode_color_jpeg, encode_color_progressive)
        for sampling in ("444", "420")
    ]
    for enc, sampling in cases:
        payload = enc(rgb, sampling)
        ours = parse_jpeg_rgb(payload)
        jpg = tmp_path / "c.jpg"
        jpg.write_bytes(payload)
        r = subprocess.run(
            [
                "ffmpeg", "-hide_banner", "-v", "error", "-i", str(jpg),
                "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
            ],
            capture_output=True,
            timeout=60,
        )
        assert r.returncode == 0, (enc.__name__, r.stderr.decode()[:300])
        theirs = np.frombuffer(r.stdout, dtype=np.uint8).reshape(32, 32, 3)
        assert np.abs(ours - theirs.astype(np.float64)).max() <= 3.0, (
            enc.__name__, sampling,
        )


@needs_ffprobe
def test_real_ffprobe_agrees_with_ogg_page_walk(tmp_path):
    """Our spec-built Ogg files must be real files to a real demuxer:
    ffprobe's codec identity and duration must match what
    parse_ogg_stream_info derives from the page index (ffmpeg's ogg
    demuxer verifies page CRCs, so this also cross-checks ogg_crc)."""
    import json as _json
    import subprocess

    from tlmc_etl_spark.functions.media import (
        make_ogg_stream,
        parse_ogg_stream_info,
    )

    for codec, rate, spp in (("vorbis", 44100, 3072), ("opus", 48000, 2880)):
        data = make_ogg_stream(
            codec, [[60 + j for j in range(3)]] * 20, spp, sample_rate=rate
        )
        p = tmp_path / f"t.{codec}.ogg"
        p.write_bytes(data)
        out = subprocess.run(
            ["ffprobe", "-v", "error", "-print_format", "json",
             "-show_streams", str(p)],
            capture_output=True, text=True, timeout=30,
        )
        assert out.returncode == 0, out.stderr
        streams = _json.loads(out.stdout)["streams"]
        assert streams[0]["codec_name"] == codec
        info = parse_ogg_stream_info(data)
        assert info["codec"] == codec
        # ffprobe derives ogg duration from the last granule too; the
        # filler packets decode as garbage but framing-level duration
        # must agree (opus: minus pre-skip at 48 kHz)
        assert abs(float(streams[0]["duration"]) - info["duration_s"]) < 0.05


@needs_7z
def test_real_7z_extracts_from_real_archive(tmp_path):
    """Extraction cross-engine gate: an archive written by REAL `7z a`
    (LZMA2-compressed payload, solid) must extract byte-identically
    through extract_7z_members — the in-container decode against the
    reference tool's own encode."""
    from tlmc_etl_spark.operators.sevenzip import extract_7z_members

    src = tmp_path / "tree"
    src.mkdir()
    pay_a = ("the quick brown fox " * 40).encode()
    pay_b = bytes(range(256)) * 3
    (src / "a.txt").write_bytes(pay_a)
    (src / "b.bin").write_bytes(pay_b)
    arc = str(tmp_path / "real.7z")
    subprocess.run(
        ["7z", "a", arc, str(src / "a.txt"), str(src / "b.bin")],
        capture_output=True, check=True,
    )
    with open(arc, "rb") as fh:
        out = extract_7z_members(fh.read())
    got = {e["path"].rsplit("/", 1)[-1]: e for e in out}
    assert got["a.txt"]["content"] == pay_a
    assert got["b.bin"]["content"] == pay_b
    # real 7z writes the substream digest table — verification must
    # have actually happened, not been skipped
    assert got["a.txt"]["crc_ok"] is True


@needs_7z
def test_real_7z_tests_our_payload_archives(tmp_path):
    """Converse: archives with LZMA payload folders and CRC tables from
    encode_7z must pass REAL `7z t` (which decodes and CRC-checks)."""
    from tlmc_etl_spark.operators.sevenzip import encode_7z

    for pc, solid in (("copy", False), ("lzma", False), ("lzma", True)):
        arc = str(tmp_path / f"p_{pc}_{solid}.7z")
        with open(arc, "wb") as fh:
            fh.write(encode_7z(
                [("x.txt", False, b"payload " * 30),
                 ("y/z.bin", False, bytes(range(256)))],
                payload_codec=pc, solid=solid, with_crcs=True,
            ))
        rc = subprocess.run(["7z", "t", arc], capture_output=True)
        assert rc.returncode == 0, (pc, solid, rc.stdout + rc.stderr)
