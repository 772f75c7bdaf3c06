"""Multimodal column operators: opaque binary payloads with typed metadata,
decoded/feature-extracted through Arrow-batched pandas UDFs.

This is the engine's version of the reference's media stages (ffprobe /
ffmpeg / MERT inference, SURVEY.md §2.10): media rides the DataFrame as a
`binary` column plus a metadata struct; per-file work happens inside
`mapInPandas` so one task batches many files (the reference's
one-process-four-rungs fusion, hls_assignment.py:109-169, is exactly this
batching argument).

All three media kinds decode REAL bytes behind `decode_payload`: audio
pipes through ffmpeg when on PATH; images decode via PIL when importable,
else a pure stdlib parser for uncompressed PPM/PGM/BMP; video decodes via
ffmpeg when on PATH, else a pure stdlib YUV4MPEG2 parser. A deterministic
fake remains for kind="synthetic" so the Spark-side plumbing (schema,
batch shape, partitioning) is testable in any environment, and
NotImplementedError marks the remaining format-shaped boundary
(compressed media with no codec available) rather than silently faking.
Swapping or extending a decoder changes ONLY decode_payload.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|synthetic
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_path", T.StringType()),
                    T.StructField("content_type", T.StringType()),
                    T.StructField("size_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def _ffmpeg_on_path() -> bool:
    import shutil as _shutil

    return _shutil.which("ffmpeg") is not None


def _rms_envelope(samples: np.ndarray) -> np.ndarray:
    """Mono PCM in [-1, 1] → centered unit 16-window RMS envelope: the
    shared audio feature, so every decode lane (ffmpeg, FLAC, WAV)
    lands in the same space."""
    win = max(1, len(samples) // FEATURE_DIM)
    # Guard on slice LENGTH, not the mean: payloads under FEATURE_DIM
    # samples leave trailing windows empty, and np.mean(empty) is NaN —
    # which is truthy, so an `or 0.0` fallback never fires.
    windows = [samples[i * win : (i + 1) * win] for i in range(FEATURE_DIM)]
    rms = np.array(
        [np.sqrt(np.mean(w**2)) if w.size else 0.0 for w in windows]
    )
    v = rms - rms.mean()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _decode_audio_ffmpeg(payload: bytes) -> np.ndarray:
    """Real-codec audio decode: payload bytes → mono f32 PCM via ffmpeg on
    stdin/stdout (no temp files — the payload is already in memory), then
    the shared RMS-envelope feature. Same argv discipline as
    operators/process.py (loudness_measure.py:111-127's contract);
    deterministic for a given payload, so the Spark-side plumbing behaves
    identically whether the decoder is real or synthetic."""
    import subprocess as _sp

    r = _sp.run(
        [
            "ffmpeg", "-hide_banner", "-v", "error", "-i", "pipe:0",
            "-f", "f32le", "-ac", "1", "-",
        ],
        input=payload,
        capture_output=True,
        timeout=120,
    )
    if r.returncode != 0 or not r.stdout:
        raise ValueError(f"ffmpeg decode failed: exit {r.returncode}")
    return _rms_envelope(np.frombuffer(r.stdout, dtype="<f4").astype(np.float64))


def _decode_audio(payload: bytes) -> np.ndarray:
    """Audio payload → RMS-envelope feature. FLAC and RIFF/WAVE decode
    in-container through the exact stdlib+numpy lanes (operators/flac.py
    is a full RFC 9639 decoder; WAV is a direct RIFF walk covering
    integer PCM 8/16/24/32, IEEE float 32/64 and extensible headers) —
    these take priority
    over ffmpeg because they are bit-exact and subprocess-free. Other
    formats decode through ffmpeg when on PATH; the remaining boundary
    is format-shaped (MP3/AAC entropy decode needs unsourceable spec
    tables), never a silent fake."""
    if not payload:
        raise ValueError("empty audio payload")
    if payload[:4] == b"fLaC":
        from tlmc_etl_spark.operators.flac import flac_decode_pcm

        mono, _sr = flac_decode_pcm(payload)
        return _rms_envelope(mono)
    if payload[:4] == b"RIFF":
        from tlmc_etl_spark.pipelines.mert_standin import parse_wav

        mono, _sr = parse_wav(payload)
        return _rms_envelope(mono)
    if _ffmpeg_on_path():
        return _decode_audio_ffmpeg(payload)
    raise NotImplementedError(
        "audio payload is neither FLAC nor RIFF/WAVE and ffmpeg is not "
        "on PATH; install ffmpeg for other codecs"
    )


def _pil_available() -> bool:
    import importlib.util as _ilu

    return _ilu.find_spec("PIL") is not None


def _parse_pnm(payload: bytes) -> np.ndarray:
    """Binary PNM (P5 gray / P6 rgb, maxval <= 255) → float64 grayscale
    (H, W) in [0, 255]. Pure stdlib+numpy: header is whitespace-separated
    tokens with '#' comments, then raw samples."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace after maxval, then raw data
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    ch = 1 if payload[:2] == b"P5" else 3
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    px = data.reshape(h, w, ch).astype(np.float64)
    if ch == 1:
        return px[:, :, 0]
    return px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114


# Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, h: int, stride: int,
                  bpp: int) -> tuple[np.ndarray, int]:
    """Reconstruct h filter-prefixed scanlines of `stride` bytes
    starting at raw[off] → ((h, stride) uint8, new offset). Filtering
    operates on BYTES regardless of sample depth (PNG spec §9), so one
    reconstruction serves 8- and 16-bit images and every Adam7 pass."""
    if len(raw) - off < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = off
    for r in range(h):
        f = raw[p]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).copy()
        p += 1 + stride
        if f == 0:  # None
            pass
        elif f == 1:  # Sub (int cast: mod-256 wrap must not lean on
            # numpy fixed-width overflow, which warns)
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif f == 2:  # Up (vectorized: uint8 addition wraps mod 256)
            cur += prev
        elif f == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on row {r}")
        out[r] = cur
        prev = cur
    return out, p


def _png_samples(rows: np.ndarray, w: int, channels: int,
                 depth: int) -> np.ndarray:
    """(h, stride) reconstructed bytes → (h, w, channels) float64 raw
    sample values (0..255 or 0..65535)."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, w, channels).astype(np.float64)
    pairs = rows.reshape(h, w, channels, 2).astype(np.float64)
    return pairs[..., 0] * 256.0 + pairs[..., 1]  # big-endian samples


def _parse_png(payload: bytes) -> np.ndarray:
    """PNG → float64 grayscale (H, W) in [0, 255].

    Pure stdlib (zlib + struct) + numpy: PNG's pixel layer is just a
    zlib stream of filter-prefixed scanlines, so the most common
    COMPRESSED image case closes in a codec-less container the same way
    the Y4M arm closed video (reference consumer:
    generate_artwork_variants.py:56-67). Supports color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), bit depths 8 and
    16, and both non-interlaced and Adam7-interlaced layouts — real
    artwork scans include interlaced and 16-bit files. The five
    standard scanline filters (None/Sub/Up/Average/Paeth) are all
    reconstructed per pass. 16-bit samples scale by 1/257 so the same
    image stored at either depth yields the IDENTICAL luma (0xABAB =
    0xAB * 257 — the standard bit-replication expansion); RGB collapses
    through the same 0.299/0.587/0.114 luma as the PNM/BMP arms."""
    import struct as _struct
    import zlib as _zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln, typ = _struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = _struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth not in (8, 16) or interlace not in (0, 1):
        raise ValueError(
            f"only 8/16-bit, interlace 0/1 PNG supported (depth={depth}, "
            f"interlace={interlace})"
        )
    if ctype == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not a legal combination")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    try:
        raw = _zlib.decompress(b"".join(idat))
    except _zlib.error as e:  # torn stream must not leak zlib.error
        raise ValueError(f"corrupt PNG zlib stream: {e}") from e
    bpp = channels * (depth // 8)
    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, h, w * bpp, bpp)
        px = _png_samples(rows, w, channels, depth)
    else:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, channels), dtype=np.float64)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue  # empty pass contributes no scanlines at all
            rows, off = _png_unfilter(raw, off, hp, wp * bpp, bpp)
            px[y0::dy, x0::dx] = _png_samples(rows, wp, channels, depth)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        px = plte[px[:, :, 0].astype(np.int64)].astype(np.float64)
        channels = 3
    scale = 257.0 if depth == 16 else 1.0
    if channels in (1, 2):  # gray (+alpha: alpha does not affect luma)
        return px[:, :, 0] / scale
    return (
        px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    ) / scale


def encode_gray_png(img: "np.ndarray", depth: int = 8,
                    interlace: int = 0) -> bytes:
    """Grayscale PNG (filter 0 per scanline) — stdlib zlib + struct.
    The encode half of the PNG arm: the media plans use it to
    synthesize in-container compressed payloads whose decode is
    value-checked against closed-form pixel math. depth 16 stores the
    given samples as big-endian 16-bit values (pass v*257 to plant the
    16-bit expansion of an 8-bit image); interlace 1 writes the seven
    Adam7 sub-images."""
    import struct as _struct
    import zlib as _zlib

    if depth not in (8, 16) or interlace not in (0, 1):
        raise ValueError("encode_gray_png: depth 8/16, interlace 0/1")
    h, w = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + typ
            + data
            + _struct.pack(">I", _zlib.crc32(typ + data))
        )

    dt = ">u2" if depth == 16 else np.uint8

    def scanlines(sub: np.ndarray) -> bytes:
        return b"".join(
            b"\x00" + sub[r].astype(dt).tobytes() for r in range(len(sub))
        )

    if interlace == 0:
        raw = scanlines(img)
    else:
        raw = b"".join(
            scanlines(img[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if img[y0::dy, x0::dx].size
        )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0,
                                      interlace))
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# GIF 4-pass row interlace (GIF89a spec appendix E): start row / step.
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code_size: int,
                    n_pixels: int) -> np.ndarray:
    """GIF-variant LZW (LSB-first variable-width codes, clear/end codes,
    12-bit cap) → exactly n_pixels palette indexes. ValueError on a
    truncated or out-of-range code stream."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"gif: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    total_bits = len(data) * 8
    bitpos = 0
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    prev: bytes | None = None
    while n_out < n_pixels:
        if bitpos + width > total_bits:
            raise ValueError("gif: LZW stream truncated")
        code = 0
        for i in range(width):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        # width grows when the NEXT code to assign would not fit
        if len(table) == (1 << width) and width < 12:
            width += 1
        if n_out + len(entry) > n_pixels:
            raise ValueError("gif: LZW output exceeds pixel count")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        prev = entry
    if n_out != n_pixels:
        raise ValueError("gif: LZW stream ended short")
    return out


def _gif_lzw_encode(indexes: bytes, min_code_size: int) -> bytes:
    """The encode half (real dictionary LZW, not the clear-every-code
    shortcut) so decoder tests exercise width growth for real."""
    clear = 1 << min_code_size
    end = clear + 1
    bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bits.append((clear, width))
    buf = b""
    for b in indexes:
        nb = buf + bytes([b])
        if nb in table:
            buf = nb
            continue
        bits.append((table[buf], width))
        if next_code < 4096:
            table[nb] = next_code
            next_code += 1
            # mirror of the decoder's growth: the decoder appends this
            # entry one code later, so widen when next_code FIRST
            # exceeds the current width's range
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        bits.append((table[buf], width))
    bits.append((end, width))
    acc = bytearray()
    cur = 0
    n = 0
    for code, w in bits:
        cur |= code << n
        n += w
        while n >= 8:
            acc.append(cur & 0xFF)
            cur >>= 8
            n -= 8
    if n:
        acc.append(cur & 0xFF)
    return bytes(acc)


def _parse_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a (first frame) → float64 grayscale (H, W) in [0, 255].

    Stdlib+numpy LZW decode — the last common legacy format in album
    artwork scans (reference consumer: generate_artwork_variants.py
    via PIL; Assets[] intake id_assign_and_merge.py:21-34). Supports
    global and local color tables, the 4-pass row interlace, and
    extension-block skipping; animations decode their first frame (the
    thumbnail semantics). ValueError on torn streams — never a
    silently wrong image."""
    import struct as _struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("gif: truncated logical screen descriptor")
    sw, sh, packed, _bg, _aspect = _struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=n * 3,
                            offset=pos).reshape(-1, 3)
        if len(gct) * 3 < n * 3:
            raise ValueError("gif: truncated global color table")
        pos += n * 3

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("gif: truncated sub-blocks")
            ln = payload[p]
            p += 1 + ln
            if ln == 0:
                return p

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("gif: no image data")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("gif: truncated extension")
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("gif: truncated image descriptor")
        _left, _top, w, h, ipacked = _struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, dtype=np.uint8, count=n * 3,
                                  offset=pos).reshape(-1, 3)
            pos += n * 3
        if table is None:
            raise ValueError("gif: image has no color table")
        if w == 0 or h == 0:
            raise ValueError("gif: empty image dimensions")
        if pos >= len(payload):
            raise ValueError("gif: truncated LZW header")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("gif: truncated image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(payload[pos : pos + ln])
            if len(chunks[-1]) < ln:
                raise ValueError("gif: truncated image data")
            pos += ln
        idx = _gif_lzw_decode(b"".join(chunks), min_code_size, w * h)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("gif: pixel index outside the color table")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # 4-pass row interlace
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE:
                n_rows = len(range(start, h, step))
                ordered[start::step] = rows[src : src + n_rows]
                src += n_rows
            rows = ordered
        px = table[rows].astype(np.float64)
        return px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    raise ValueError("gif: stream ended before any image block")


def encode_gray_gif(img: "np.ndarray", interlace: bool = False) -> bytes:
    """Grayscale single-frame GIF89a (256-gray global palette, real
    LZW) — the encode half of the GIF arm, same role as
    encode_gray_png."""
    import struct as _struct

    h, w = img.shape
    idx = img.astype(np.uint8)
    if interlace:
        idx = np.concatenate(
            [idx[start::step] for start, step in _GIF_INTERLACE]
        )
    lzw = _gif_lzw_encode(idx.tobytes(), 8)
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + _struct.pack("<HHHHB", 0, 0, w, h,
                                  0x40 if interlace else 0)
    out += bytes([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _parse_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BI_RGB, BITMAPINFOHEADER) → float64
    grayscale (H, W). Rows are 4-byte aligned; positive height means
    bottom-up storage."""
    import struct as _struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = _struct.unpack_from("<I", payload, 10)[0]
    w, h = _struct.unpack_from("<ii", payload, 18)
    bpp = _struct.unpack_from("<H", payload, 28)[0]
    comp = _struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(abs(h)):
        off = data_off + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off)
        rows.append(row.reshape(w, 3).astype(np.float64))
    px = np.stack(rows)  # stored order; BGR channels
    if h > 0:  # bottom-up → flip to top-down
        px = px[::-1]
    return px[:, :, 2] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 0] * 0.114


def _pool_luma(gray: np.ndarray) -> np.ndarray:
    """(H, W) grayscale → FEATURE_DIM (4x4) mean-pooled vector, unnormalized.
    Edge blocks absorb the remainder rows/cols so every pixel counts once."""
    h, w = gray.shape
    side = 4  # FEATURE_DIM == side * side
    rh, rw = max(1, h // side), max(1, w // side)
    pooled = np.zeros(FEATURE_DIM, dtype=np.float64)
    for r in range(side):
        for c in range(side):
            block = gray[r * rh : (r + 1) * rh if r < side - 1 else h,
                         c * rw : (c + 1) * rw if c < side - 1 else w]
            pooled[r * side + c] = block.mean() if block.size else 0.0
    return pooled


def _unit_centered(v: np.ndarray) -> np.ndarray:
    v = v - v.mean()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _decode_image(payload: bytes) -> np.ndarray:
    """Image payload → FEATURE_DIM pooled-luma feature. PIL decodes any
    format when importable; otherwise pure stdlib+numpy parsers handle
    uncompressed PPM/PGM/BMP AND zlib-compressed PNG — real pixel
    decode, not a hash fake, so the image arm (including the common
    compressed case) is exercised for real even in this container (no
    PIL). The stdlib paths yield identical pixels to each other for the
    same image, so the feature is format-independent. The 4x4 mean-pool
    mirrors the audio arm's 16-window RMS envelope."""
    if _pil_available():
        import io as _io

        from PIL import Image as _Image

        gray = np.asarray(
            _Image.open(_io.BytesIO(payload)).convert("L"), dtype=np.float64
        )
    elif payload[:2] in (b"P5", b"P6"):
        gray = _parse_pnm(payload)
    elif payload[:2] == b"BM":
        gray = _parse_bmp(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        gray = _parse_png(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        gray = _parse_gif(payload)
    elif payload[:2] == b"\xff\xd8":
        from tlmc_etl_spark.operators.jpeg import parse_jpeg_luma

        gray = parse_jpeg_luma(payload)
    else:
        raise NotImplementedError(
            "image payload is neither PNM, BMP, PNG, GIF nor baseline "
            "JPEG and PIL is not installed; pip install pillow for other "
            "formats"
        )
    return _unit_centered(_pool_luma(gray))


MAX_SAMPLED_FRAMES = 16


def _parse_y4m(payload: bytes) -> list[np.ndarray]:
    """YUV4MPEG2 (.y4m) → list of float64 grayscale (H, W) frames (the Y
    plane; chroma planes are skipped per the header's C colourspace tag).
    Y4M is the uncompressed interchange container ffmpeg/x264 pipe to each
    other: a text header 'YUV4MPEG2 W.. H.. F.. [C..]\\n', then per frame
    'FRAME[params]\\n' + raw planar data — parseable with stdlib+numpy
    alone, which is what makes a REAL video-pixel arm possible in a
    container with no codec libraries."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "strict")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    cs = "420"
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C":
            cs = tok[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    ysize = w * h
    chroma = {
        "mono": 0.0, "420": 0.5, "420jpeg": 0.5, "420mpeg2": 0.5,
        "420paldv": 0.5, "422": 1.0, "444": 2.0,
    }.get(cs)
    if chroma is None:
        raise ValueError(f"unsupported Y4M colourspace C{cs}")
    fsize = ysize + int(ysize * chroma)
    frames: list[np.ndarray] = []
    i = nl + 1
    while i < len(payload):
        j = payload.index(b"\n", i)
        if payload[i:j].split(b" ")[0] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        i = j + 1
        if i + fsize > len(payload):
            raise ValueError("truncated Y4M frame data")
        y = np.frombuffer(payload, dtype=np.uint8, count=ysize, offset=i)
        frames.append(y.reshape(h, w).astype(np.float64))
        i += fsize
    if not frames:
        raise ValueError("Y4M payload carries zero frames")
    return frames


def _sample_frames(n: int, k: int = MAX_SAMPLED_FRAMES) -> list[int]:
    """Uniform deterministic frame sample: k indices across [0, n) (all of
    them when n <= k) — the same time-axis policy as frame_sample_plan."""
    if n <= k:
        return list(range(n))
    return [(i * n) // k for i in range(k)]


def _video_feature(frames: list[np.ndarray]) -> np.ndarray:
    """Uniformly sampled frames → mean of per-frame 4x4 pooled luma →
    centred unit vector: the spatial layout of the image arm with the
    time axis folded in, so image and video features share a space."""
    idx = _sample_frames(len(frames))
    pooled = np.mean([_pool_luma(frames[i]) for i in idx], axis=0)
    return _unit_centered(pooled)


def _decode_video_ffmpeg(payload: bytes) -> np.ndarray:
    """Real-codec video decode: payload bytes → 16x16 gray rawvideo frames
    via ffmpeg on stdin/stdout (no temp files), then the shared sampled-
    frame pooled-luma feature. The scale filter normalizes every codec's
    frame geometry to the pool grid; a production deployment would add an
    fps= filter so a feature never decodes more frames than it samples."""
    import subprocess as _sp

    r = _sp.run(
        [
            "ffmpeg", "-hide_banner", "-v", "error", "-i", "pipe:0",
            "-f", "rawvideo", "-pix_fmt", "gray", "-vf", "scale=16:16", "-",
        ],
        input=payload,
        capture_output=True,
        timeout=120,
    )
    frame_bytes = 16 * 16
    if r.returncode != 0 or len(r.stdout) < frame_bytes:
        raise ValueError(f"ffmpeg video decode failed: exit {r.returncode}")
    n = len(r.stdout) // frame_bytes
    raw = np.frombuffer(r.stdout, dtype=np.uint8, count=n * frame_bytes)
    frames = [f.astype(np.float64) for f in raw.reshape(n, 16, 16)]
    return _video_feature(frames)


def _decode_video(payload: bytes) -> np.ndarray:
    """Video payload → FEATURE_DIM feature. ffmpeg decodes any container
    when on PATH; otherwise the stdlib Y4M parser handles uncompressed
    YUV4MPEG2 — like the image arm, real pixels either way, and
    NotImplementedError only for compressed formats in a codec-less
    environment (the honest remaining boundary, now format- not
    modality-shaped)."""
    if _ffmpeg_on_path():
        return _decode_video_ffmpeg(payload)
    if payload[:9] == b"YUV4MPEG2":
        return _video_feature(_parse_y4m(payload))
    raise NotImplementedError(
        "video payload is not YUV4MPEG2 and ffmpeg is not on PATH; "
        "install ffmpeg for compressed containers"
    )


def decode_payload(kind: str, payload: bytes) -> np.ndarray:
    """Decode a media payload to a feature vector.

    kind="synthetic" produces a deterministic fake feature (bytes → hash
    → unit vector) so plumbing is testable end-to-end in any
    environment. kind="audio" decodes FLAC (full RFC 9639 decoder,
    operators/flac.py) and RIFF/WAVE in-container, and other codecs
    through REAL ffmpeg when on PATH (pipe-through f32 PCM); every lane
    lands in the shared 16-window RMS-envelope feature, so the same
    operators run on real media with zero plan change
    (tests/test_real_tools.py carries the opt-in gate). kind="image"
    decodes through PIL when importable, else a pure stdlib parser for
    uncompressed PPM/PGM/BMP (real pixels either way; 4x4 pooled-luma
    feature). kind="video" decodes through ffmpeg when on PATH, else
    the stdlib YUV4MPEG2 parser — sampled frames, pooled luma, the
    image feature space with the time axis folded in. The remaining
    boundary is format-shaped (compressed media in a codec-less
    environment), never a silent fake.
    """
    if kind == "audio":
        return _decode_audio(payload)
    if kind == "image":
        return _decode_image(payload)
    if kind == "video":
        return _decode_video(payload)
    if kind != "synthetic":
        raise NotImplementedError(
            f"no codec for kind={kind!r} in this environment; "
            "plug a real decoder into decode_payload()"
        )
    digest = hashlib.sha256(payload or b"").digest()
    # '<u2' pins little-endian so the feature is platform-independent (and
    # reproducible by the SQL oracle's byte arithmetic).
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype="<u2").astype(np.float64)
    v = raw - raw.mean()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature array<double>).

    One `mapInPandas` pass: each Arrow batch decodes its files in-process.
    At 100 TB the media table is bucketed by media_id so tasks stream
    payloads partition-locally; `batch_hint` maps to
    spark.sql.execution.arrow.maxRecordsPerBatch in a real deployment
    (VRAM/latency budget per batch — mert_batched_uuid.py:360-372's
    batch-size sweep is this constant).
    """

    def run(batches):
        for pdf in batches:
            feats = [decode_payload(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(
        run, schema="media_id string, kind string, n_bytes long, feature array<double>"
    )


def dominant_colors(
    pixels: DataFrame,
    id_col: str,
    r: str = "r",
    g: str = "g",
    b: str = "b",
    n_colors: int = 8,
    levels: int = 4,
) -> DataFrame:
    """Pixel-share-ordered dominant palette per image:
    (id, colors array<'#rrggbb'> dominant-first).

    The reference quantizes a thumbnail to 8 adaptive colors and orders
    them by pixel share (generate_artwork_variants.py:56-67's octree
    approach). Spark-native core: uniform cube quantization (`levels`
    per channel — the deterministic, distributable stand-in for the
    adaptive octree, which is a per-image sequential structure), then
    groupBy count and share-ordered gather. Ordering is (share desc,
    color asc) — deterministic where the reference's palette-index
    tie-break was quantizer-internal. Map + one shuffle per image set;
    the gather is array_sort over collected (share, color) structs, so
    no window and no second shuffle.
    """
    step = 256 // levels

    def q(c: str):
        return (F.expr(f"({c} DIV {step}) * {step} + {step // 2}")).cast("int")

    quant = pixels.select(
        F.col(id_col).alias("artwork_id"), q(r).alias("qr"), q(g).alias("qg"), q(b).alias("qb")
    )
    counts = quant.groupBy("artwork_id", "qr", "qg", "qb").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    hexed = counts.select(
        "artwork_id",
        "cnt",
        F.format_string("#%02x%02x%02x", "qr", "qg", "qb").alias("color"),
    )
    ranked = F.array_sort(
        F.collect_list(F.struct((-F.col("cnt")).alias("k"), F.col("color").alias("c")))
    )
    return hexed.groupBy("artwork_id").agg(
        F.slice(F.transform(ranked, lambda s: s["c"]), 1, n_colors).alias("colors")
    )


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8 text
    bytes, kind=synthetic — the stand-in corpus for plumbing tests."""
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("media_id"),
        F.lit("synthetic").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("source_path"),
            F.lit("text/plain").alias("content_type"),
            F.length("text").cast("long").alias("size_bytes"),
        ).alias("meta"),
    )
