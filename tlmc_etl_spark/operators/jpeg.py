"""Baseline JPEG luma decode, pure stdlib + numpy.

Closes the last common compressed-image case at the codec boundary
(reference consumer: generate_artwork_variants.py:56-67 — album artwork
is overwhelmingly JPEG). The feature pipeline needs only LUMA, and
JFIF's Y channel IS the 0.299R + 0.587G + 0.114B luma, so this decodes
the Y component exactly and skips chroma reconstruction entirely —
chroma blocks are still entropy-decoded (the interleaved bitstream
cannot be skipped), but never dequantized or IDCT'd.

Scope: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs), 8-bit, any sampling factors, restart
markers, multi-table DHT/DQT. Real artwork scans are frequently
progressive (PIL-saved web images default to it at quality>=90), so the
reference's PIL path (generate_artwork_variants.py:56-67) handles them;
this arm now does too. Chroma AC scans are non-interleaved by spec, so
the luma-only decode SKIPS their entropy segments entirely — scan-level
column pruning the baseline interleaved format can't offer. Arithmetic
coding, hierarchical, lossless, and 12-bit precision raise ValueError —
re-encode exotica relative to the archive-scan reality this arm serves.
When PIL is importable the multimodal dispatch prefers it; this is the
in-container arm, exercised for real by an encoder-independent test
harness (tests/test_jpeg.py builds spec-conformant JPEGs by hand).

The IDCT is the exact orthonormal float transform (one 8x8 matrix
sandwich per block, vectorized over all blocks at once) — libjpeg's
integer approximations differ by ±1-2 per pixel, which the 4x4
mean-pool feature downstream is insensitive to.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K zigzag: zigzag_order[i] = position in the 8x8 block (row-major)
# of the i-th coefficient in transmission order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT matrix: block = D.T @ coeff @ D inverts
# coeff = D @ block @ D.T.
_D = np.array(
    [
        [
            (np.sqrt(0.5) if i == 0 else 1.0)
            * np.cos((2 * j + 1) * i * np.pi / 16.0)
            / 2.0
            for j in range(8)
        ]
        for i in range(8)
    ]
)


class _Huff:
    """Canonical JPEG Huffman table: (code_length, code) -> symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.n_bits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: synthesize padding so a final partial MCU's
                # trailing reads don't run off the segment
                self.bits = (self.bits << 8) | 0xFF
                self.n_bits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.n_bits += 8

    def read_bit(self) -> int:
        if self.n_bits == 0:
            self._fill()
        self.n_bits -= 1
        return (self.bits >> self.n_bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self) -> None:
        """Discard buffered bits and skip to the next marker boundary
        (used at restart intervals)."""
        self.bits = 0
        self.n_bits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1


def _parse_dqt_into(seg: bytes, qt: dict) -> None:
    """DQT segment → quant tables (8- or 16-bit precision), shared by the
    baseline and progressive marker loops."""
    i = 0
    while i < len(seg):
        prec, tid = seg[i] >> 4, seg[i] & 0x0F
        i += 1
        if prec == 0:
            qt[tid] = np.frombuffer(seg, np.uint8, 64, i).astype(np.float64)
            i += 64
        else:
            qt[tid] = np.frombuffer(seg, ">u2", 64, i).astype(np.float64)
            i += 128


def _parse_dht_into(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    """DHT segment → canonical Huffman tables, shared by both loops
    (progressive files redefine tables between scans)."""
    i = 0
    while i < len(seg):
        cls, tid = seg[i] >> 4, seg[i] & 0x0F
        counts = list(seg[i + 1 : i + 17])
        n = sum(counts)
        (huff_dc if cls == 0 else huff_ac)[tid] = _Huff(
            counts, seg[i + 17 : i + 17 + n]
        )
        i += 17 + n


def _extend(v: int, size: int) -> int:
    """JPEG magnitude decode: `size`-bit value -> signed coefficient."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def parse_jpeg_luma(payload: bytes) -> np.ndarray:
    """Baseline JPEG payload -> float64 luma plane (H, W) in [0, 255].

    Every malformed/truncated input surfaces as ValueError (the image
    arm's must-error-never-fake contract) — a payload cut off inside a
    segment header or the entropy stream otherwise leaks IndexError /
    struct.error from the readers."""
    try:
        return _parse_jpeg_luma(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt JPEG: {e}") from e


# JFIF / ITU-R BT.601 full-range colour transform constants.
_YCBCR_FWD = (
    (0.299, 0.587, 0.114),
    (-0.168736, -0.331264, 0.5),
    (0.5, -0.418688, -0.081312),
)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) RGB in [0, 255] → (..., 3) full-range YCbCr, rounded
    HALF-UP to integers (floor(x + 0.5) — NOT np.round, whose banker's
    rounding diverges from SQL round on exact halves)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = _YCBCR_FWD[0][0] * r + _YCBCR_FWD[0][1] * g + _YCBCR_FWD[0][2] * b
    cb = 128.0 + _YCBCR_FWD[1][0] * r + _YCBCR_FWD[1][1] * g + _YCBCR_FWD[1][2] * b
    cr = 128.0 + _YCBCR_FWD[2][0] * r + _YCBCR_FWD[2][1] * g + _YCBCR_FWD[2][2] * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0.0, 255.0)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Full-range YCbCr planes → (H, W, 3) float64 RGB in [0, 255]."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0)


def parse_jpeg_rgb(payload: bytes) -> np.ndarray:
    """Colour JPEG (baseline SOF0/1 or progressive SOF2) → (H, W, 3)
    float64 RGB in [0, 255].

    Full chroma reconstruction: every component is entropy-decoded
    (across all progressive scans where applicable), dequantized and
    IDCT'd at its own sampling resolution, chroma planes are
    box-replicated up to the luma grid (exact for the constant-per-MCU
    payloads the value-checked plans encode), and JFIF YCbCr → RGB
    applied. Grayscale (1-component) payloads replicate the luma plane.
    Same must-error contract as parse_jpeg_luma."""
    try:
        return _parse_jpeg_rgb(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt JPEG: {e}") from e


def _parse_jpeg_rgb(payload: bytes) -> np.ndarray:
    qt, huff_dc, huff_ac, restart_interval, frame, pos, seg, seg_len = (
        _walk_headers(payload)
    )
    comps = frame["comps"]
    if frame["progressive"]:
        return _decode_progressive(
            payload, pos - 2, frame, qt, huff_dc, huff_ac,
            restart_interval, want_rgb=True,
        )
    if len(comps) == 1:
        gray = _parse_jpeg_luma(payload)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise ValueError(f"expected 1 or 3 components, got {len(comps)}")
    ns = seg[0]
    if ns != 3:
        raise ValueError("colour decode requires one interleaved scan")
    scan = {}
    for c in range(ns):
        cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
        scan[cid] = (tables >> 4, tables & 0x0F)
    planes = _decode_scan_planes(
        payload, pos + seg_len, frame, scan, qt, huff_dc, huff_ac,
        restart_interval,
    )
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    up = []
    for comp in comps:
        p = planes[comp["id"]]
        if v_max % comp["v"] or h_max % comp["h"]:
            # legal but rare non-integer ratios (e.g. v=3 against v=2)
            # would need fractional resampling; silently skipping the
            # upsample would return misaligned colour
            raise ValueError(
                f"unsupported non-integer sampling ratio "
                f"({h_max}x{v_max} over {comp['h']}x{comp['v']})"
            )
        fy, fx = v_max // comp["v"], h_max // comp["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        up.append(p[:h, :w])
    return ycbcr_to_rgb(up[0], up[1], up[2])


def _walk_headers(payload: bytes):
    """Marker walk up to the first SOS: (qt, huff_dc, huff_ac,
    restart_interval, frame, sos_pos, sos_seg, sos_seg_len) — shared by
    the luma and RGB decoders."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker sync at {pos}")
        # spec B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip padding until the marker code byte
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before any scan: nothing to decode
            break
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt_into(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht_into(seg, huff_dc, huff_ac)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (precision {prec})")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline/progressive DCT JPEG supported "
                f"(SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            return qt, huff_dc, huff_ac, restart_interval, frame, pos, seg, seg_len
        pos += seg_len
    raise ValueError("JPEG has no scan data")


def _parse_jpeg_luma(payload: bytes) -> np.ndarray:
    qt, huff_dc, huff_ac, restart_interval, frame, pos, seg, seg_len = (
        _walk_headers(payload)
    )
    if frame["progressive"]:
        return _decode_progressive(
            payload, pos - 2, frame, qt, huff_dc, huff_ac,
            restart_interval,
        )
    ns = seg[0]
    scan = {}
    for c in range(ns):
        cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
        scan[cid] = (tables >> 4, tables & 0x0F)
    comps = frame["comps"]
    if ns == 1:
        # single-component scans are ALWAYS non-interleaved
        # (spec A.2.2: MCU = one data unit, sampling factors
        # describe only the component's relative resolution).
        # Luma decode needs the FIRST scan to be Y; multi-scan
        # baseline files order Y first in practice, and we
        # return after it without parsing the chroma scans.
        cid = next(iter(scan))
        if cid != comps[0]["id"]:
            raise ValueError(
                "first scan is not the luma component "
                f"(component {cid})"
            )
        return _decode_scan_single(
            payload, pos + seg_len, frame, scan, qt, huff_dc,
            huff_ac, restart_interval,
        )
    if ns != len(comps):
        raise ValueError(
            f"unsupported partial interleaved scan ({ns} of "
            f"{len(comps)} components)"
        )
    return _decode_scan(
        payload, pos + seg_len, frame, scan, qt, huff_dc, huff_ac,
        restart_interval,
    )


def _decode_scan_planes(
    payload, data_pos, frame, scan, qt, huff_dc, huff_ac, restart_interval,
    wanted: set | None = None,
) -> dict[int, np.ndarray]:
    """One interleaved baseline scan → {component id: plane}, every plane
    at its component's own sampling resolution (dequant + inverse zigzag
    + IDCT in one vectorized pass per component). `wanted` limits which
    components get stored/IDCT'd (the others are still entropy-walked to
    keep the bitstream in sync) — the luma-only path skips the chroma
    transform work entirely."""
    comps = frame["comps"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * h_max))
    mcus_y = -(-frame["h"] // (8 * v_max))
    keep = {c["id"] for c in comps} if wanted is None else wanted
    store = {
        c["id"]: {
            "coeffs": np.zeros((mcus_x * mcus_y * c["h"] * c["v"], 64)),
            "pos": np.empty((mcus_x * mcus_y * c["h"] * c["v"], 2), np.int64),
            "bi": 0,
        }
        for c in comps
        if c["id"] in keep
    }

    reader = _BitReader(payload, data_pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                m = payload[reader.pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected restart marker, got {m:02x}")
                reader.pos += 2
                preds = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for comp in comps:
                dc_t = huff_dc[scan[comp["id"]][0]]
                ac_t = huff_ac[scan[comp["id"]][1]]
                st = store.get(comp["id"])
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block = _decode_block(reader, dc_t, ac_t, preds, comp["id"])
                        if st is None:
                            continue
                        bi = st["bi"]
                        st["coeffs"][bi] = block
                        st["pos"][bi] = (
                            (my * comp["v"] + by) * 8,
                            (mx * comp["h"] + bx) * 8,
                        )
                        st["bi"] += 1
    planes: dict[int, np.ndarray] = {}
    for comp in comps:
        if comp["id"] not in store:
            continue
        st = store[comp["id"]]
        bi = st["bi"]
        dq = st["coeffs"][:bi] * qt[comp["tq"]][None, :]
        mat = np.zeros((bi, 64))
        mat[:, ZIGZAG] = dq
        pixels = np.einsum(
            "ij,njk,kl->nil", _D.T, mat.reshape(bi, 8, 8), _D
        ) + 128.0
        plane = np.zeros((mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8))
        for n in range(bi):
            r, c = st["pos"][n]
            plane[r : r + 8, c : c + 8] = pixels[n]
        planes[comp["id"]] = plane
    return planes


def _decode_scan(
    payload, data_pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
):
    y_id = frame["comps"][0]["id"]  # first component is Y (JFIF)
    planes = _decode_scan_planes(
        payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
        restart_interval, wanted={y_id},
    )
    return np.clip(planes[y_id][: frame["h"], : frame["w"]], 0.0, 255.0)


def _decode_scan_single(
    payload, data_pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
):
    """Non-interleaved scan of the first (luma) component: one data unit
    per MCU, block grid = ceil(comp_w/8) x ceil(comp_h/8) over the
    component's own resolution ceil(W*h_i/h_max) x ceil(H*v_i/v_max)."""
    comps = frame["comps"]
    y_comp = comps[0]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    comp_w = -(-frame["w"] * y_comp["h"] // h_max)
    comp_h = -(-frame["h"] * y_comp["v"] // v_max)
    blocks_x = -(-comp_w // 8)
    blocks_y = -(-comp_h // 8)
    dc_t = huff_dc[scan[y_comp["id"]][0]]
    ac_t = huff_ac[scan[y_comp["id"]][1]]
    qy = qt[y_comp["tq"]]
    n_blocks = blocks_x * blocks_y
    coeffs = np.zeros((n_blocks, 64))
    reader = _BitReader(payload, data_pos)
    preds = {y_comp["id"]: 0}
    for bi in range(n_blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            reader.align_to_marker()
            m = payload[reader.pos + 1]
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected restart marker, got {m:02x}")
            reader.pos += 2
            preds = {y_comp["id"]: 0}
        coeffs[bi] = _decode_block(reader, dc_t, ac_t, preds, y_comp["id"])
    dq = coeffs * qy[None, :]
    mat = np.zeros((n_blocks, 64))
    mat[:, ZIGZAG] = dq
    pixels = np.einsum("ij,njk,kl->nil", _D.T, mat.reshape(n_blocks, 8, 8), _D) + 128.0
    plane = np.zeros((blocks_y * 8, blocks_x * 8))
    for n in range(n_blocks):
        r, c = (n // blocks_x) * 8, (n % blocks_x) * 8
        plane[r : r + 8, c : c + 8] = pixels[n]
    return np.clip(plane[:comp_h, :comp_w], 0.0, 255.0)


def _decode_block(reader, dc_t, ac_t, preds, cid) -> np.ndarray:
    out = np.zeros(64)
    size = reader.decode(dc_t)
    diff = _extend(reader.read_bits(size), size)
    preds[cid] += diff
    out[0] = preds[cid]
    k = 1
    while k < 64:
        sym = reader.decode(ac_t)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError(f"bad AC symbol {sym:02x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        out[k] = _extend(reader.read_bits(size), size)
        k += 1
    return out


# ---- progressive (SOF2) ---------------------------------------------------


def _next_marker(payload: bytes, pos: int) -> int:
    """Scan forward to the next real marker (skips stuffed 0xFF00 and
    restart markers RST0-7, which live inside entropy data)."""
    n = len(payload)
    while pos < n - 1:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    raise ValueError("unterminated JPEG entropy segment")


def _decode_progressive(
    payload, pos, frame, qt, huff_dc, huff_ac, restart_interval,
    want_rgb: bool = False,
):
    """Progressive scan loop: accumulate coefficients across DC/AC
    first+refinement scans, then dequant+IDCT once at EOI.

    Per spec, DC scans (Ss=0) may interleave all components and AC scans
    are single-component. want_rgb=False decodes only the luma store and
    SKIPS chroma AC scans at the segment level (the bulk of a colour
    file's bytes); want_rgb=True accumulates every component and
    reconstructs RGB exactly like the baseline colour path (chroma
    upsample + JFIF transform)."""
    comps = frame["comps"]
    y_comp = comps[0]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * h_max))
    mcus_y = -(-frame["h"] // (8 * v_max))
    # per-component coefficient accumulators in zigzag (transmission)
    # index space, raster-indexed by (block_row * wide + block_col) on
    # the INTERLEAVED grid (mcus * sampling factor — non-interleaved
    # scans write their own ceil-grid into the top-left region); int64
    # because refinement does bit tests on exact values
    stores: dict[int, dict] = {}
    for c in comps:
        if not want_rgb and c is not y_comp:
            continue
        wide_c = mcus_x * c["h"]
        high_c = mcus_y * c["v"]
        cw = -(-frame["w"] * c["h"] // h_max)
        chh = -(-frame["h"] * c["v"] // v_max)
        stores[c["id"]] = {
            "coef": np.zeros((high_c * wide_c, 64), dtype=np.int64),
            "wide": wide_c,
            "high": high_c,
            "comp_w": cw,
            "comp_h": chh,
            "bx": -(-cw // 8),
            "by": -(-chh // 8),
            "tq": c["tq"],
        }
    saw_scan = False

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker sync at {pos}")
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xC4:  # DHT — progressive files redefine per scan
            _parse_dht_into(seg, huff_dc, huff_ac)
        elif marker == 0xDB:
            _parse_dqt_into(seg, qt)
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:
            saw_scan = True
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cid, tables >> 4, tables & 0x0F))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            data_pos = pos + seg_len
            if ss == 0:  # DC scan (interleaved or not)
                if se != 0:
                    raise ValueError("progressive DC scan with Se != 0")
                pos = _prog_dc_scan(
                    payload, data_pos, frame, scan, huff_dc, ah, al,
                    restart_interval, stores, mcus_x, mcus_y, h_max,
                    v_max,
                )
            else:  # AC scan: single component by spec
                if ns != 1:
                    raise ValueError("progressive AC scan must be 1 component")
                cid, _, ac_tid = scan[0]
                st = stores.get(cid)
                if st is None:
                    pos = _next_marker(payload, data_pos)  # unwanted: skip
                else:
                    pos = _prog_ac_scan(
                        payload, data_pos, huff_ac[ac_tid], ss, se, ah, al,
                        restart_interval, st["coef"], st["wide"],
                        st["bx"], st["by"],
                    )
            continue
        else:
            pass  # APPn/COM/etc — skip
        pos += seg_len

    if not saw_scan:
        raise ValueError("progressive JPEG has no scan data")

    def _plane(st: dict) -> np.ndarray:
        dq = st["coef"].astype(np.float64) * qt[st["tq"]][None, :]
        n_blocks = dq.shape[0]
        mat = np.zeros((n_blocks, 64))
        mat[:, ZIGZAG] = dq
        pixels = (
            np.einsum("ij,njk,kl->nil", _D.T, mat.reshape(n_blocks, 8, 8), _D)
            + 128.0
        )
        wide_c = st["wide"]
        plane = np.zeros((st["high"] * 8, wide_c * 8))
        for n in range(n_blocks):
            r, c = (n // wide_c) * 8, (n % wide_c) * 8
            plane[r : r + 8, c : c + 8] = pixels[n]
        return plane

    if not want_rgb:
        st = stores[y_comp["id"]]
        return np.clip(
            _plane(st)[: st["comp_h"], : st["comp_w"]], 0.0, 255.0
        )
    if len(comps) == 1:
        st = stores[y_comp["id"]]
        gray = np.clip(
            _plane(st)[: st["comp_h"], : st["comp_w"]], 0.0, 255.0
        )
        return np.repeat(gray[:, :, None], 3, axis=2)
    if len(comps) != 3:
        # CMYK/YCCK etc: refusing beats silently dropping a plane
        raise ValueError(f"expected 1 or 3 components, got {len(comps)}")
    h, w = frame["h"], frame["w"]
    up = []
    for comp in comps:
        p = _plane(stores[comp["id"]])
        if v_max % comp["v"] or h_max % comp["h"]:
            raise ValueError(
                f"unsupported non-integer sampling ratio "
                f"({h_max}x{v_max} over {comp['h']}x{comp['v']})"
            )
        fy, fx = v_max // comp["v"], h_max // comp["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        up.append(p[:h, :w])
    return ycbcr_to_rgb(up[0], up[1], up[2])


def _prog_restart(reader, payload) -> None:
    reader.align_to_marker()
    m = payload[reader.pos + 1]
    if not (0xD0 <= m <= 0xD7):
        raise ValueError(f"expected restart marker, got {m:02x}")
    reader.pos += 2


def _prog_dc_scan(
    payload, data_pos, frame, scan, huff_dc, ah, al, restart_interval,
    stores, mcus_x, mcus_y, h_max, v_max,
):
    """DC first (Ah=0: Huffman diffs, value = pred << Al) or refinement
    (Ah>0: one appended bit per block). Each scanned component's
    coefficients land in its own store; components without a store
    (luma-only decode) are entropy-consumed and discarded."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    reader = _BitReader(payload, data_pos)
    preds = {cid: 0 for cid, _, _ in scan}
    unit = 0

    if len(scan) == 1:
        # non-interleaved: raster over the component's OWN block grid
        cid, dc_tid, _ = scan[0]
        comp = by_id[cid]
        st = stores.get(cid)
        cw = -(-frame["w"] * comp["h"] // h_max)
        chh = -(-frame["h"] * comp["v"] // v_max)
        bx, by = -(-cw // 8), -(-chh // 8)
        for bi in range(bx * by):
            if restart_interval and bi and bi % restart_interval == 0:
                _prog_restart(reader, payload)
                preds = {cid: 0}
            if ah == 0:
                size = reader.decode(huff_dc[dc_tid])
                preds[cid] += _extend(reader.read_bits(size), size)
                val = preds[cid] << al
            if st is not None:
                idx = (bi // bx) * st["wide"] + (bi % bx)
                if ah == 0:
                    st["coef"][idx, 0] = val
                else:
                    st["coef"][idx, 0] |= reader.read_bit() << al
            elif ah != 0:
                reader.read_bit()
        return _next_marker(payload, reader.pos)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and unit and unit % restart_interval == 0:
                _prog_restart(reader, payload)
                preds = {cid: 0 for cid, _, _ in scan}
            unit += 1
            for cid, dc_tid, _ in scan:
                comp = by_id[cid]
                st = stores.get(cid)
                for vy in range(comp["v"]):
                    for vx in range(comp["h"]):
                        if ah == 0:
                            size = reader.decode(huff_dc[dc_tid])
                            preds[cid] += _extend(
                                reader.read_bits(size), size
                            )
                            if st is not None:
                                idx = (my * comp["v"] + vy) * st["wide"] + (
                                    mx * comp["h"] + vx
                                )
                                st["coef"][idx, 0] = preds[cid] << al
                        else:
                            bit = reader.read_bit()
                            if st is not None:
                                idx = (my * comp["v"] + vy) * st["wide"] + (
                                    mx * comp["h"] + vx
                                )
                                st["coef"][idx, 0] |= bit << al
    return _next_marker(payload, reader.pos)


def _prog_ac_scan(
    payload, data_pos, ac_t, ss, se, ah, al, restart_interval, coef,
    wide, blocks_x, blocks_y,
):
    """AC first scan (Ah=0: run/size symbols + EOBn run-length codes,
    value = v << Al) or refinement (Ah>0: spec G.1.2.3 — newly-significant
    coefficients carry a sign bit, already-nonzero ones a correction bit,
    EOB runs still consume correction bits across the rest of each band)."""
    reader = _BitReader(payload, data_pos)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    for bi in range(blocks_x * blocks_y):
        if restart_interval and bi and bi % restart_interval == 0:
            _prog_restart(reader, payload)
            eobrun = 0
        idx = (bi // blocks_x) * wide + (bi % blocks_x)
        row = coef[idx]
        if ah == 0:
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = reader.decode(ac_t)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index out of band")
                row[k] = _extend(reader.read_bits(s), s) << al
                k += 1
        else:
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = reader.decode(ac_t)
                    r, s = sym >> 4, sym & 0x0F
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # r == 15: ZRL in refinement — skip 16 zero-history
                    else:
                        if s != 1:
                            raise ValueError("refinement size must be 1")
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        c = row[k]
                        if c != 0:
                            if reader.read_bit() and (int(c) & p1) == 0:
                                row[k] = c + (p1 if c >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if s:
                        if k > se:
                            raise ValueError("AC index out of band")
                        row[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    c = row[k]
                    if c != 0 and reader.read_bit() and (int(c) & p1) == 0:
                        row[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1
    return _next_marker(payload, reader.pos)


# ---- encoder -------------------------------------------------------------
#
# Baseline encoder (grayscale + 4:2:0 constant-chroma): written directly
# from the spec, independently of the decoder above — the media plans use
# it to synthesize in-container JPEG payloads whose decode is
# value-checked against closed-form pixel math (plans/multimodal.py), and
# tests/test_jpeg.py gates decode(encode(x)) ~= x plus an opt-in ffmpeg
# cross-decode that breaks any encoder/decoder self-consistency loop.


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# flat tables: all DC size-symbols at length 4, all AC symbols at length 8
FLAT_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
FLAT_DC_SYMBOLS = list(range(12))
_AC_SYMS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
    # EOBn symbols (RRRR<<4, SSSS=0) for progressive scans' EOB runs
    + [run << 4 for run in range(1, 15)]
)
FLAT_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8
FLAT_AC_SYMBOLS = _AC_SYMS
# Annex K.3.1 luminance DC table (real variable-length codes)
K3_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K3_DC_SYMBOLS = list(range(12))


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(cls: int, tid: int, counts, symbols) -> bytes:
    return _seg(
        0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
    )


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coeff = _D @ (block - 128.0) @ _D.T
    zz = coeff.reshape(-1)[ZIGZAG]
    return np.round(zz / q).astype(np.int64)


def _mag(v: int):
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(w, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    size, bits = _mag(diff)
    length, code = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            w.write(code, length)
            run -= 16
        size, bits = _mag(v)
        length, code = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        length, code = ac_codes[0x00]
        w.write(code, length)
    return int(zz[0])


def encode_gray_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    dc_counts=FLAT_DC_COUNTS,
    dc_symbols=FLAT_DC_SYMBOLS,
    restart_interval: int = 0,
    sampling: int = 0x11,
) -> bytes:
    """Grayscale baseline JPEG (1 component). `sampling` sets the SOF
    sampling byte — a single-component scan is non-interleaved per spec,
    so the declared factors must not change decoded geometry (gated in
    tests/test_jpeg.py)."""
    h, w = img.shape
    q = np.ones(64) if quant is None else quant.astype(np.float64)
    dc_codes = _canonical_codes(dc_counts, dc_symbols)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, sampling, 0])
    )
    out += _dht(0, 0, dc_counts, dc_symbols)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    bw = _BitWriter()
    pred = 0
    padded = np.pad(img.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge")
    mcu = 0
    rst = 0
    for r in range(0, padded.shape[0], 8):
        for c in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = 0
            mcu += 1
            zz = _fdct_quant(padded[r : r + 8, c : c + 8], q)
            pred = _encode_block(bw, zz, pred, dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_420_jpeg(y: np.ndarray, chroma_val: int = 128) -> bytes:
    """YCbCr 4:2:0 baseline JPEG with constant chroma planes — the
    interleave/MCU structure of a real color JPEG (4 Y blocks + Cb +
    Cr per MCU), with the decoder expected to surface exactly `y`."""
    h, w = y.shape
    q = np.ones(64)
    dc_codes = _canonical_codes(FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht(0, 0, FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")
    bw = _BitWriter()
    pad_h, pad_w = -h % 16, -w % 16
    padded = np.pad(y.astype(np.float64), ((0, pad_h), (0, pad_w)), mode="edge")
    preds = {1: 0, 2: 0, 3: 0}
    chroma = np.full((8, 8), float(chroma_val))
    for r in range(0, padded.shape[0], 16):
        for c in range(0, padded.shape[1], 16):
            for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                zz = _fdct_quant(padded[r + by : r + by + 8, c + bx : c + bx + 8], q)
                preds[1] = _encode_block(bw, zz, preds[1], dc_codes, ac_codes)
            for cid in (2, 3):
                zz = _fdct_quant(chroma, q)
                preds[cid] = _encode_block(bw, zz, preds[cid], dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _color_planes(rgb: np.ndarray, sampling: str, encoder: str):
    """Shared colour-plane preparation for BOTH colour encoders: JFIF
    HALF-UP transform, edge-pad to the MCU grid, 4:2:0 HALF-UP box-mean
    chroma. The box-mean rounding is oracle-load-bearing (the SQL twin
    replays it), so baseline and progressive MUST share one copy."""
    if sampling not in ("420", "444"):
        raise ValueError(f"unsupported sampling {sampling!r}")
    h, w, nc = rgb.shape
    if nc != 3:
        raise ValueError(f"{encoder} needs (H, W, 3) input")
    ycc = rgb_to_ycbcr(rgb.astype(np.float64))
    mcu = 16 if sampling == "420" else 8
    pad = ((0, -h % mcu), (0, -w % mcu), (0, 0))
    p = np.pad(ycc, pad, mode="edge")
    yp, cb, cr = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    if sampling == "420":
        # box mean, HALF-UP to keep the closed form integer-exact for
        # MCU-constant colour
        cb = np.floor(
            (cb[0::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 0::2] + cb[1::2, 1::2])
            / 4.0 + 0.5
        )
        cr = np.floor(
            (cr[0::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 0::2] + cr[1::2, 1::2])
            / 4.0 + 0.5
        )
    return yp, cb, cr, mcu


def encode_color_jpeg(rgb: np.ndarray, sampling: str = "420") -> bytes:
    """(H, W, 3) RGB in [0, 255] → baseline colour JPEG (quant all-ones).

    RGB converts through the HALF-UP-rounded JFIF transform
    (rgb_to_ycbcr); '420' box-averages chroma 2x2 (exact when colour is
    constant per 16x16 MCU — the layout the value-checked plans plant),
    '444' keeps full chroma. With q=1, block-constant input decodes
    bit-exactly through the DC path, so parse_jpeg_rgb(encode(x)) equals
    the closed-form transform arithmetic an SQL oracle replays."""
    h, w = rgb.shape[:2]
    yp, cb, cr, mcu = _color_planes(rgb, sampling, "encode_color_jpeg")
    q = np.ones(64)
    dc_codes = _canonical_codes(FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    y_hv = 0x22 if sampling == "420" else 0x11
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, y_hv, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht(0, 0, FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for r in range(0, yp.shape[0], mcu):
        for c in range(0, yp.shape[1], mcu):
            y_origin = ((0, 0), (0, 8), (8, 0), (8, 8)) if mcu == 16 else ((0, 0),)
            for by, bx in y_origin:
                zz = _fdct_quant(yp[r + by : r + by + 8, c + bx : c + bx + 8], q)
                preds[1] = _encode_block(bw, zz, preds[1], dc_codes, ac_codes)
            cf = 2 if sampling == "420" else 1
            for cid, plane in ((2, cb), (3, cr)):
                blk = plane[r // cf : r // cf + 8, c // cf : c // cf + 8]
                zz = _fdct_quant(blk, q)
                preds[cid] = _encode_block(bw, zz, preds[cid], dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- progressive encoder --------------------------------------------------
#
# Spec-built progressive grayscale/4:2:0 encoders, written from Annex G
# independently of the decoder above (same role as encode_gray_jpeg: the
# in-container test double that keeps the decode arm honest without PIL).

# libjpeg's "simple progression" script shape: DC first at Al=1, low/high
# AC bands at Al=2..1, then refinements down to Al=0.
DEFAULT_PROG_SCANS = (
    (0, 0, 0, 1),   # DC first, Al=1
    (1, 5, 0, 2),   # AC 1-5 first, Al=2
    (6, 63, 0, 2),  # AC 6-63 first, Al=2
    (1, 63, 2, 1),  # AC refine Al 2->1
    (0, 0, 1, 0),   # DC refine Al 1->0
    (1, 63, 1, 0),  # AC refine Al 1->0
)


class _ProgACState:
    """EOB-run + buffered-correction-bit state for one AC scan
    (G.1.2.2-3): EOBn symbols count runs of end-of-band blocks, and in
    refinement scans the correction bits of history coefficients ride
    behind the symbol that terminates the run."""

    def __init__(self, w: _BitWriter, ac_codes):
        self.w = w
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def emit_sym(self, sym: int) -> None:
        length, code = self.ac_codes[sym]
        self.w.write(code, length)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            if r > 14:
                raise ValueError("EOB run exceeds EOB14")
            self.emit_sym(r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self.w.write(b, 1)
        self.pending_bits = []


def _enc_ac_first(state: _ProgACState, zz, ss, se, al) -> None:
    w, run = state.w, 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = -((-v) >> al) if v < 0 else v >> al  # toward-zero point transform
        if v == 0:
            run += 1
            continue
        state.flush_eobrun()
        while run > 15:
            state.emit_sym(0xF0)
            run -= 16
        size, bits = _mag(v)
        state.emit_sym((run << 4) | size)
        w.write(bits, size)
        run = 0
    if run > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def _enc_ac_refine(state: _ProgACState, zz, ss, se, al) -> None:
    w = state.w
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    signs = [1 if int(zz[k]) >= 0 else 0 for k in range(ss, se + 1)]
    # last newly-significant index (history coefs never end the pass)
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    run = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        # pending ZRLs flush at EVERY nonzero (G.1.2.3 / libjpeg note):
        # a history coefficient must never sit more than 15 zeros deep in
        # the pending run, or the correction bits buffered behind a later
        # ZRL would land beyond the decoder's 16-zero advance window
        while run > 15 and i <= eob:
            state.flush_eobrun()
            state.emit_sym(0xF0)
            run -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if t > 1:  # history coefficient: correction bit
            br.append(t & 1)
            continue
        # newly significant (t == 1)
        state.flush_eobrun()
        state.emit_sym((run << 4) | 1)
        w.write(signs[i], 1)
        for b in br:
            w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        state.eobrun += 1
        state.pending_bits.extend(br)
        if state.eobrun == 0x7FFF or len(state.pending_bits) > 937:
            state.flush_eobrun()


def encode_gray_progressive(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    scans=DEFAULT_PROG_SCANS,
) -> bytes:
    """Grayscale progressive JPEG (SOF2) over the given scan script of
    (Ss, Se, Ah, Al) tuples. Uses the flat Huffman tables throughout."""
    h, w = img.shape
    q = np.ones(64) if quant is None else quant.astype(np.float64)
    dc_codes = _canonical_codes(FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    padded = np.pad(
        img.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge"
    )
    blocks = [
        _fdct_quant(padded[r : r + 8, c : c + 8], q)
        for r in range(0, padded.shape[0], 8)
        for c in range(0, padded.shape[1], 8)
    ]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )
    out += _dht(0, 0, FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    for ss, se, ah, al in scans:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        bw = _BitWriter()
        if ss == 0:  # DC scan
            if ah == 0:
                pred = 0
                for zz in blocks:
                    sh = int(zz[0]) >> al
                    size, bits = _mag(sh - pred)
                    length, code = dc_codes[size]
                    bw.write(code, length)
                    if size:
                        bw.write(bits, size)
                    pred = sh
            else:
                for zz in blocks:
                    bw.write((int(zz[0]) >> al) & 1, 1)
        else:
            state = _ProgACState(bw, ac_codes)
            for zz in blocks:
                if ah == 0:
                    _enc_ac_first(state, zz, ss, se, al)
                else:
                    _enc_ac_refine(state, zz, ss, se, al)
            state.flush_eobrun()
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_color_progressive(rgb: np.ndarray, sampling: str = "420") -> bytes:
    """(H, W, 3) RGB → progressive (SOF2) colour JPEG with REAL chroma:
    interleaved DC first + refinement scans and per-component AC first
    scans over each component's own grid — the full scan structure of a
    real progressive colour file, with the same HALF-UP JFIF transform
    and all-ones quant as encode_color_jpeg, so MCU-constant colour
    decodes exactly through parse_jpeg_rgb's progressive path."""
    h, w = rgb.shape[:2]
    yp, cb, cr, mcu = _color_planes(rgb, sampling, "encode_color_progressive")
    q = np.ones(64)
    dc_codes = _canonical_codes(FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    y_hv = 0x22 if sampling == "420" else 0x11

    def grid(plane):
        gh, gw = plane.shape[0] // 8, plane.shape[1] // 8
        return [
            _fdct_quant(plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8], q)
            for r in range(gh)
            for c in range(gw)
        ], gw, gh

    yb, ybw, ybh = grid(yp)
    cbb, cbw, cbh = grid(cb)
    crb, crw, crh = grid(cr)
    mcus_x, mcus_y = cbw, cbh  # chroma grid == MCU grid for both samplings

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, y_hv, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht(0, 0, FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)

    def mcu_units():
        yf = 2 if sampling == "420" else 1
        for my in range(mcus_y):
            for mx in range(mcus_x):
                ys = [
                    yb[(yf * my + by) * ybw + yf * mx + bx]
                    for by in range(yf)
                    for bx in range(yf)
                ]
                yield ys, cbb[my * cbw + mx], crb[my * crw + mx]

    # interleaved DC first scan, Al=1
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}

    def put_dc(zz, cid, al):
        sh = int(zz[0]) >> al
        size, bits = _mag(sh - preds[cid])
        length, code = dc_codes[size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)
        preds[cid] = sh

    for ys, czb, czr in mcu_units():
        for zz in ys:
            put_dc(zz, 1, 1)
        put_dc(czb, 2, 1)
        put_dc(czr, 3, 1)
    bw.flush()
    out += bw.out

    # per-component AC first scans (Al=0) over each component's SPEC
    # grid — ceil(comp_w/8) x ceil(comp_h/8) (A.2.2), NOT the padded MCU
    # grid: at 4:2:0 the padded luma grid carries extra padding blocks
    # per row that a non-interleaved scan must not emit (the decoder
    # would assign them to the next row's first block)
    cf = 2 if sampling == "420" else 1
    cw, chh = -(-w // cf), -(-h // cf)  # chroma component dimensions
    cgw, cgh = -(-cw // 8), -(-chh // 8)
    for cid, blocks, stride, gw, gh in (
        (1, yb, ybw, -(-w // 8), -(-h // 8)),
        (2, cbb, cbw, cgw, cgh),
        (3, crb, crw, cgw, cgh),
    ):
        out += _seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0x00]))
        bw = _BitWriter()
        state = _ProgACState(bw, ac_codes)
        for r in range(gh):
            for c in range(gw):
                _enc_ac_first(state, blocks[r * stride + c], 1, 63, 0)
        state.flush_eobrun()
        bw.flush()
        out += bw.out

    # interleaved DC refinement scan, Ah=1 -> Al=0
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    bw = _BitWriter()
    for ys, czb, czr in mcu_units():
        for zz in ys:
            bw.write(int(zz[0]) & 1, 1)
        bw.write(int(czb[0]) & 1, 1)
        bw.write(int(czr[0]) & 1, 1)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_420_progressive(y: np.ndarray, chroma_val: int = 128) -> bytes:
    """YCbCr 4:2:0 progressive JPEG with constant chroma: interleaved DC
    first + refinement scans (3 components, 4 Y blocks + Cb + Cr per
    MCU) and per-component AC scans — the structure a real color
    progressive file has, so the decoder's interleaved-DC path and its
    chroma-AC-scan SKIP are both exercised against a spec-built stream."""
    h, w = y.shape
    q = np.ones(64)
    dc_codes = _canonical_codes(FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    ac_codes = _canonical_codes(FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)
    padded = np.pad(
        y.astype(np.float64), ((0, -h % 16), (0, -w % 16)), mode="edge"
    )
    bw16, bh16 = padded.shape[1] // 8, padded.shape[0] // 8
    yblocks = [
        _fdct_quant(padded[r : r + 8, c : c + 8], q)
        for r in range(0, padded.shape[0], 8)
        for c in range(0, padded.shape[1], 8)
    ]
    czz = _fdct_quant(np.full((8, 8), float(chroma_val)), q)
    mcus_x, mcus_y = bw16 // 2, bh16 // 2

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht(0, 0, FLAT_DC_COUNTS, FLAT_DC_SYMBOLS)
    out += _dht(1, 0, FLAT_AC_COUNTS, FLAT_AC_SYMBOLS)

    def mcu_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                ys = [
                    yblocks[(2 * my + by) * bw16 + 2 * mx + bx]
                    for by in (0, 1)
                    for bx in (0, 1)
                ]
                yield ys

    # interleaved DC first scan, Al=1
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}

    def put_dc(zz, cid, al):
        sh = int(zz[0]) >> al
        size, bits = _mag(sh - preds[cid])
        length, code = dc_codes[size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)
        preds[cid] = sh

    for ys in mcu_blocks():
        for zz in ys:
            put_dc(zz, 1, 1)
        put_dc(czz, 2, 1)
        put_dc(czz, 3, 1)
    bw.flush()
    out += bw.out

    # per-component AC first scans (Al=0), luma over its OWN grid
    for cid, blocks, gw, gh in (
        (1, yblocks, -(-w // 8), -(-h // 8)),
        (2, [czz] * (mcus_x * mcus_y), mcus_x, mcus_y),
        (3, [czz] * (mcus_x * mcus_y), mcus_x, mcus_y),
    ):
        out += _seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0x00]))
        bw = _BitWriter()
        state = _ProgACState(bw, ac_codes)
        for r in range(gh):
            for c in range(gw):
                zz = blocks[r * (bw16 if cid == 1 else mcus_x) + c]
                _enc_ac_first(state, zz, 1, 63, 0)
        state.flush_eobrun()
        bw.flush()
        out += bw.out

    # interleaved DC refinement scan, Ah=1 -> Al=0
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    bw = _BitWriter()
    for ys in mcu_blocks():
        for zz in ys:
            bw.write(int(zz[0]) & 1, 1)
        bw.write(int(czz[0]) & 1, 1)
        bw.write(int(czz[0]) & 1, 1)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
