"""In-container FLAC codec (RFC 9639): spec-built encoder + exact decoder.

FLAC is the one compressed codec in the corpus whose full decode is
buildable from a public spec alone — RFC 9639 defines Rice coding and the
fixed/LPC predictors in closed form, with no entropy tables to
approximate (unlike MP3/AAC/H.264, which stay at the declared ffmpeg
boundary).  The reference decodes FLAC through soundfile/ffmpeg for the
embedding loader (Experimental/vector_search/loader.py:113-146) and the
cue splitter (CueSplitter/cue_designator.py); this module makes that lane
real in a codec-less container, following the PNG/JPEG operator pattern
(operators/jpeg.py): stdlib+numpy, ValueError on torn bitstreams, and a
spec-built encoder so plans can synthesize conformant payloads whose
decode is value-checked against closed-form SQL.

Decode is EXACT — FLAC is lossless and every step (n-th-difference fixed
predictors, integer LPC with arithmetic right shift, zigzag Rice
residuals, stereo decorrelation) is integer arithmetic, so
decode(encode(x)) == x bit-for-bit and an oracle can replay features of
the ORIGINAL samples.  Both CRCs (CRC-8 header, CRC-16 frame) are
verified; a mismatch raises rather than yielding silently wrong PCM.

Scale shape: one payload decodes inside a single task (mapInPandas
batches many files per task); the hot loop is the Rice reader, which
walks a precomputed set-bit index (O(total bits) across a frame, no
per-sample numpy scan) and reconstructs fixed-predictor subframes with
vectorized cumulative sums.
"""

from __future__ import annotations

import struct

import numpy as np

from tlmc_etl_spark.functions.media import (
    _valueerror_boundary,
    parse_flac_metadata,
)

# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.1: CRC-8 poly x^8+x^2+x+1 = 0x07 over the frame
# header; §9.2: CRC-16 poly x^16+x^15+x^2+1 = 0x8005 over the whole
# frame). Both MSB-first, init 0.
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# ---------------------------------------------------------------------------
# Frame-header code tables (RFC 9639 §9.1).
# ---------------------------------------------------------------------------

# block-size bits -> size; None = reserved/explicit field follows
_BLOCK_SIZES = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLE_RATES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_BPS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
              32: 0b111}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODES.items()}

_FIXED_ORDERS = (0, 1, 2, 3, 4)


def pcm_md5(samples: np.ndarray, bits_per_sample: int) -> bytes:
    """RFC 9639 §8.2 unencoded-audio MD5: channel-interleaved samples as
    little-endian signed integers of ceil(bps/8) bytes. The one
    integrity field frame CRCs do NOT cover (STREAMINFO itself), and the
    end-to-end whole-file check real decoders (`flac -t`) enforce.
    Hashed in bounded chunks — the transient byte copies must stay
    O(chunk), matching the bit reader's O(window) discipline, not grow
    with album length."""
    import hashlib

    width = (bits_per_sample + 7) // 8
    flat = samples.reshape(-1)
    md5 = hashlib.md5()
    step = 1 << 20
    for i in range(0, flat.size, step):
        raw = np.ascontiguousarray(flat[i : i + step].astype("<i8")).tobytes()
        view = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 8)[:, :width]
        md5.update(np.ascontiguousarray(view).tobytes())
    return md5.digest()


def _encode_coded_number(n: int) -> bytes:
    """RFC 9639 §9.1.5 coded number: the UTF-8 byte pattern extended to
    36 bits (7-byte form with 0xFE lead)."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        payload_bits = (7 - nbytes if nbytes < 7 else 0) + 6 * (nbytes - 1)
        if n < (1 << payload_bits):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            lead = (0xFF << (8 - nbytes)) & 0xFF if nbytes < 7 else 0xFE
            out[0] = lead | n
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator (same shape as operators/jpeg.py's, but
    without JPEG's 0xFF byte stuffing — FLAC has none)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bit_array(self, bits: np.ndarray):
        """Append a 0/1 uint8 array in one packbits pass (the Rice
        residual fast path — per-sample write() calls were the encode
        bottleneck)."""
        if self.n:
            head = np.empty(self.n, dtype=np.uint8)
            for i in range(self.n - 1, -1, -1):
                head[i] = (self.acc >> (self.n - 1 - i)) & 1
            bits = np.concatenate([head, bits])
            self.acc = 0
            self.n = 0
        whole = len(bits) // 8 * 8
        if whole:
            self.out += np.packbits(bits[:whole]).tobytes()
        for b in bits[whole:]:
            self.acc = (self.acc << 1) | int(b)
            self.n += 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        if self.n:
            raise ValueError("unaligned bit writer")
        return bytes(self.out)


class _Bits:
    """MSB-first bit reader over the audio region: a SLIDING unpacked-bit
    window plus a set-bit index over it, so unary (Rice quotient) reads
    cost a cursor advance, not a scan — and memory stays O(window), not
    O(file) (unpackbits is 8 B per source byte and the int64 set-bit
    index ~4 B more at typical density: a whole-file unpack of an album
    FLAC would cost ~12x the payload per in-flight decode).

    Window positions are relative: `pos`/`n_bits` are absolute bit
    offsets into `data`; `bits`/`ones` cover [base, base+len(bits)).
    The window slides forward on demand; every slide lands on the
    current byte, so a read never spans a slide boundary longer than
    the window itself (1 MB of source ≫ any legal frame field)."""

    _WINDOW_BYTES = 1 << 20

    def __init__(self, data: bytes, start_byte: int):
        self.data = data
        self.pos = start_byte * 8
        self.n_bits = len(data) * 8
        self._slide(start_byte)

    def _slide(self, byte0: int):
        self.base = byte0 * 8
        chunk = np.frombuffer(
            self.data, dtype=np.uint8, offset=byte0,
            count=min(self._WINDOW_BYTES, len(self.data) - byte0),
        )
        self.bits = np.unpackbits(chunk)
        self.ones = np.flatnonzero(self.bits)
        self._one_cursor = 0

    def _ensure(self, end: int):
        if end > self.n_bits:
            raise ValueError("flac: bitstream truncated")
        if end > self.base + len(self.bits):
            self._slide(self.pos // 8)

    def read(self, n: int) -> int:
        end = self.pos + n
        self._ensure(end)
        lo = self.pos - self.base
        v = int(
            self.bits[lo : lo + n]
            @ (1 << np.arange(n - 1, -1, -1, dtype=np.int64))
        )
        self.pos = end
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        while True:
            rel = self.pos - self.base
            ones = self.ones
            c = self._one_cursor
            n = len(ones)
            while c < n and ones[c] < rel:
                c += 1
            if c < n:
                self._one_cursor = c + 1
                stop = self.base + int(ones[c])
                q = stop - self.pos
                self.pos = stop + 1
                return q
            # no stop bit left in the window
            if self.base + len(self.bits) >= self.n_bits:
                raise ValueError("flac: bitstream truncated in unary run")
            if (self.pos // 8) * 8 == self.base:
                # a full window of zero bits is no legal Rice quotient
                raise ValueError("flac: unary run exceeds window")
            self._slide(self.pos // 8)

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        if self.pos % 8:
            raise ValueError("flac: misaligned byte position")
        return self.pos // 8

    def read_coded_number(self) -> int:
        lead = self.read(8)
        if lead < 0x80:
            return lead
        nbytes = 0
        probe = lead
        while probe & 0x80:
            nbytes += 1
            probe = (probe << 1) & 0xFF
        if nbytes < 2 or nbytes > 7:
            raise ValueError("flac: malformed coded number lead byte")
        value = lead & ((1 << (7 - nbytes)) - 1) if nbytes < 7 else 0
        for _ in range(nbytes - 1):
            b = self.read(8)
            if (b & 0xC0) != 0x80:
                raise ValueError("flac: malformed coded number continuation")
            value = (value << 6) | (b & 0x3F)
        return value


# ---------------------------------------------------------------------------
# Rice residual coding (RFC 9639 §9.2.7): zigzag fold, unary quotient +
# k remainder bits, partitioned with per-partition parameter; escape
# code stores raw n-bit two's-complement residuals.
# ---------------------------------------------------------------------------


def _zigzag(r: np.ndarray) -> np.ndarray:
    return (r << 1) ^ (r >> 63)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    return (z >> 1) ^ -(z & 1)


def _best_rice_param(zz: np.ndarray) -> tuple[int, int]:
    """(k, cost_bits) minimizing unary+remainder length over k in 0..14."""
    best_k, best_cost = 0, None
    for k in range(15):
        cost = int(np.sum(zz >> k)) + zz.size * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        elif cost > best_cost * 2:
            break  # cost is convex-ish in k; bail once clearly past the min
    return best_k, best_cost


def _write_residual(w: _BitWriter, residual: np.ndarray, order: int,
                    block_size: int, partition_order: int):
    if block_size % (1 << partition_order):
        raise ValueError("partition order does not divide block size")
    # RFC 9639 §9.2.7: (block size >> partition order) must be STRICTLY
    # larger than the predictor order — shrink until it is (halving
    # preserves divisibility), so legal (block_size, lpc_order,
    # partition_order) combinations — including short tail blocks —
    # always encode a conformant stream, never one with an empty first
    # partition
    while partition_order and (block_size >> partition_order) <= order:
        partition_order -= 1
    w.write(0, 2)  # coding method 0: 4-bit Rice parameters
    w.write(partition_order, 4)
    n_parts = 1 << partition_order
    part_len = block_size >> partition_order
    if part_len < order:
        raise ValueError("predictor order exceeds first partition")
    pos = 0
    for p in range(n_parts):
        n = part_len - order if p == 0 else part_len
        chunk = residual[pos : pos + n]
        pos += n
        zz = _zigzag(chunk.astype(np.int64))
        k, rice_cost = _best_rice_param(zz)
        raw_width = 0
        if chunk.size:
            m = int(np.max(np.abs(chunk)))
            raw_width = m.bit_length() + 1 if m else 1
        if chunk.size and 5 + raw_width * chunk.size < 4 + rice_cost:
            w.write(0b1111, 4)  # escape: raw two's-complement residuals
            w.write(raw_width, 5)
            for v in chunk:
                w.write(int(v) & ((1 << raw_width) - 1), raw_width)
        else:
            w.write(k, 4)
            if chunk.size:
                # vectorized emission: [q zeros][1][k remainder bits] per
                # sample, materialized as one bit array
                q = zz >> k
                step = q + 1 + k
                ends = np.cumsum(step)
                bits = np.zeros(int(ends[-1]), dtype=np.uint8)
                bits[ends - 1 - k] = 1  # stop bits
                if k:
                    rem_pos = (ends - k)[:, None] + np.arange(k)[None, :]
                    rem = (zz[:, None] >> np.arange(k - 1, -1, -1)[None, :]) & 1
                    bits[rem_pos] = rem.astype(np.uint8)
                w.write_bit_array(bits)


def _read_residual(bits: _Bits, order: int, block_size: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    partition_order = bits.read(4)
    n_parts = 1 << partition_order
    if block_size % n_parts:
        raise ValueError("flac: partition order does not divide block size")
    part_len = block_size >> partition_order
    out = np.empty(block_size - order, dtype=np.int64)
    pos = 0
    for p in range(n_parts):
        n = part_len - order if p == 0 else part_len
        if n < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        k = bits.read(param_bits)
        if n == 0:
            continue
        if k == escape:
            width = bits.read(5)
            if width == 0:
                out[pos : pos + n] = 0
            else:
                for i in range(n):
                    out[pos + i] = bits.read_signed(width)
            pos += n
            continue
        zz = _rice_partition_fast(bits, n, k)
        if zz is None:
            # the set-bit index ran out mid-partition: Rice quotients are
            # unbounded, so a conformant stream whose encoder chose a
            # small k for large residuals can push one partition past the
            # window headroom. Fall back to incremental reads — unary()
            # and read() slide the window on demand per sample, and raise
            # the truncation ValueError themselves if the stream really
            # ends.
            zz = np.empty(n, dtype=np.int64)
            for i in range(n):
                q = bits.unary()
                zz[i] = (q << k) | (bits.read(k) if k else 0)
        out[pos : pos + n] = _unzigzag(zz)
        pos += n
    return out


def _rice_partition_fast(bits: _Bits, n: int, k: int) -> np.ndarray | None:
    """Vectorizable walk over the set-bit index, window-relative: decode
    one Rice partition's n zigzagged values, advancing the reader.
    Guarantees headroom first — a typical partition is at most
    blocksize x ~33 bits (~270 KB), far under half a window — sliding
    once per partition instead of checking per sample. Returns None
    WITHOUT consuming anything when the window's set-bit index is
    exhausted mid-partition (oversized quotients or true truncation:
    the caller's incremental fallback distinguishes them)."""
    if (
        bits.base + len(bits.bits) < bits.n_bits
        and bits.base + len(bits.bits) - bits.pos < (4 << 20)
    ):
        bits._slide(bits.pos // 8)
    ones = bits.ones
    rel0 = bits.pos - bits.base
    c = int(np.searchsorted(ones, rel0, side="left"))
    n_ones = len(ones)
    if k == 0:
        # no remainder bits: stop bits are exactly the next n set
        # bits — fully vectorized
        if c + n > n_ones:
            return None
        starts = ones[c : c + n].astype(np.int64)
        c += n
        b = int(starts[-1]) + 1
    else:
        # remainder bits interleave with stop bits: sequential walk,
        # but over a plain int list (numpy scalar indexing is ~4x
        # slower per element in this hot loop)
        need = min(n_ones - c, n * (k + 2) + 16)
        ol = ones[c : c + need].tolist()
        starts = np.empty(n, dtype=np.int64)
        b = rel0
        j = 0
        n_ol = len(ol)
        for i in range(n):
            while j < n_ol and ol[j] < b:
                j += 1
            if j >= n_ol:
                return None
            stop = ol[j]
            j += 1
            starts[i] = stop
            b = stop + 1 + k
        c += j
    if b > len(bits.bits):
        return None
    q = starts.copy()
    q[1:] -= starts[:-1] + 1 + k
    q[0] -= rel0
    if k:
        idx = (starts + 1)[:, None] + np.arange(k)[None, :]
        rem = bits.bits[idx].astype(np.int64) @ (
            1 << np.arange(k - 1, -1, -1, dtype=np.int64)
        )
    else:
        rem = np.zeros(n, dtype=np.int64)
    bits.pos = bits.base + b
    bits._one_cursor = c
    return (q << k) | rem


# ---------------------------------------------------------------------------
# Predictors (RFC 9639 §9.2.5-9.2.6). Fixed orders are n-th differences;
# LPC is integer: pred = (sum qcoef[j] * x[i-1-j]) >> shift (arithmetic).
# ---------------------------------------------------------------------------


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x, n=order) if order else x.copy()


def _fixed_restore(warmup: np.ndarray, residual: np.ndarray,
                   order: int) -> np.ndarray:
    """Inverse n-th difference via repeated cumulative sums — vectorized,
    no per-sample Python loop."""
    if order == 0:
        return residual.copy()
    # cur holds d_{k+1} at positions k+1..N-1; its first (order-1-k)
    # entries are warmup-covered and must NOT feed the integration
    cur = residual.astype(np.int64)
    for k in range(order - 1, -1, -1):
        head = np.diff(warmup, n=k).astype(np.int64)  # d_k at k..order-1
        cur = np.concatenate(
            [head, head[-1] + np.cumsum(cur[order - 1 - k :])]
        )
    return cur


def _levinson(autoc: np.ndarray, order: int) -> np.ndarray | None:
    err = float(autoc[0])
    if err <= 0:
        return None
    lpc = np.zeros(order)
    for i in range(order):
        r = float(autoc[i + 1])
        for j in range(i):
            r -= lpc[j] * autoc[i - j]
        r /= err
        lpc_i = lpc[: i][::-1].copy()
        lpc[: i] -= r * lpc_i
        lpc[i] = r
        err *= 1.0 - r * r
        if err <= 0:
            return None
    return lpc


def _quantize_lpc(coefs: np.ndarray, precision: int = 12
                  ) -> tuple[np.ndarray, int]:
    cmax = float(np.max(np.abs(coefs)))
    if cmax <= 0:
        return np.zeros(len(coefs), dtype=np.int64), 0
    shift = precision - 1 - (int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    lo, hi = -(1 << (precision - 1)), (1 << (precision - 1)) - 1
    q = np.clip(np.round(coefs * (1 << shift)), lo, hi).astype(np.int64)
    return q, shift


def _lpc_residual(x: np.ndarray, qcoef: np.ndarray, shift: int
                  ) -> np.ndarray:
    order = len(qcoef)
    x64 = x.astype(np.int64)
    acc = np.zeros(len(x) - order, dtype=np.int64)
    for j in range(order):
        acc += qcoef[j] * x64[order - 1 - j : len(x) - 1 - j]
    return x64[order:] - (acc >> shift)


def _lpc_restore(warmup: np.ndarray, residual: np.ndarray,
                 qcoef: np.ndarray, shift: int,
                 eff_bps: int = 33) -> np.ndarray:
    order = len(qcoef)
    out = [int(v) for v in warmup]
    coefs = [int(c) for c in qcoef]
    # Conformant restored samples fit eff_bps signed exactly; corruption
    # that survives the header CRC-8 (CRC-16 runs only after subframe
    # decode) can make this Python-int feedback loop explode past int64
    # — bound each sample so corrupt streams raise ValueError, never
    # OverflowError from the final int64 conversion.
    lim = 1 << (eff_bps + 1)
    for r in residual:
        acc = 0
        for j in range(order):
            acc += coefs[j] * out[-1 - j]
        v = (acc >> shift) + int(r)
        if v > lim or v < -lim:
            raise ValueError("flac: LPC restore exceeds sample range")
        out.append(v)
    return np.array(out, dtype=np.int64)


# ---------------------------------------------------------------------------
# Subframe encode/decode (RFC 9639 §9.2.3-9.2.4).
# ---------------------------------------------------------------------------


def _wasted_bits(x: np.ndarray, bps: int) -> int:
    nz = x[x != 0]
    if nz.size == 0:
        return 0
    w = 0
    v = np.bitwise_or.reduce(nz.astype(np.int64))
    while w < bps - 1 and not (v >> w) & 1:
        w += 1
    return w


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int, mode: str,
                     lpc_order: int, partition_order: int):
    wasted = _wasted_bits(x, bps)
    x = (x.astype(np.int64) >> wasted) if wasted else x.astype(np.int64)
    eff_bps = bps - wasted

    def header(type_bits: int):
        w.write(0, 1)
        w.write(type_bits, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    n = len(x)
    if np.all(x == x[0]) and mode != "verbatim":
        header(0b000000)  # CONSTANT
        w.write(int(x[0]) & ((1 << eff_bps) - 1), eff_bps)
        return
    if mode == "verbatim":
        header(0b000001)
        for v in x:
            w.write(int(v) & ((1 << eff_bps) - 1), eff_bps)
        return
    if mode == "lpc" and n > lpc_order >= 1:
        xf = x.astype(np.float64)
        autoc = np.array(
            [np.dot(xf[: n - lag], xf[lag:]) for lag in range(lpc_order + 1)]
        )
        coefs = _levinson(autoc, lpc_order)
        if coefs is not None:
            qcoef, shift = _quantize_lpc(coefs)
            if np.any(qcoef):
                header(0b100000 | (lpc_order - 1))
                for v in x[:lpc_order]:
                    w.write(int(v) & ((1 << eff_bps) - 1), eff_bps)
                w.write(12 - 1, 4)  # precision-1
                w.write(shift, 5)
                for c in qcoef:
                    w.write(int(c) & ((1 << 12) - 1), 12)
                _write_residual(w, _lpc_residual(x, qcoef, shift),
                                lpc_order, n, partition_order)
                return
        # degenerate LPC (silent/unstable block): fall through to fixed
    orders = [o for o in _FIXED_ORDERS if o < n]
    costs = [int(np.sum(np.abs(_fixed_residual(x, o)))) for o in orders]
    order = orders[int(np.argmin(costs))]
    header(0b001000 | order)
    for v in x[:order]:
        w.write(int(v) & ((1 << eff_bps) - 1), eff_bps)
    _write_residual(w, _fixed_residual(x, order), order, n, partition_order)


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if stype == 0b000000:  # CONSTANT
        out = np.full(block_size, bits.read_signed(eff_bps), dtype=np.int64)
    elif stype == 0b000001:  # VERBATIM
        out = np.fromiter(
            (bits.read_signed(eff_bps) for _ in range(block_size)),
            dtype=np.int64, count=block_size,
        )
    elif 0b001000 <= stype <= 0b001100:  # FIXED, order 0-4
        order = stype & 0x07
        if order > block_size:
            raise ValueError("flac: fixed order exceeds block size")
        warmup = np.fromiter(
            (bits.read_signed(eff_bps) for _ in range(order)),
            dtype=np.int64, count=order,
        )
        residual = _read_residual(bits, order, block_size)
        out = _fixed_restore(warmup, residual, order)
    elif stype >= 0b100000:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
        if order > block_size:
            raise ValueError("flac: LPC order exceeds block size")
        warmup = np.fromiter(
            (bits.read_signed(eff_bps) for _ in range(order)),
            dtype=np.int64, count=order,
        )
        precision = bits.read(4)
        if precision == 0b1111:
            raise ValueError("flac: invalid LPC precision code")
        precision += 1
        shift = bits.read(5)
        if shift >= 16:  # signed 5-bit: negative shift is invalid
            raise ValueError("flac: negative LPC shift")
        qcoef = np.fromiter(
            (bits.read_signed(precision) for _ in range(order)),
            dtype=np.int64, count=order,
        )
        residual = _read_residual(bits, order, block_size)
        out = _lpc_restore(warmup, residual, qcoef, shift, eff_bps)
    else:
        raise ValueError(f"flac: reserved subframe type {stype:#08b}")
    return out << wasted if wasted else out


# ---------------------------------------------------------------------------
# Stereo decorrelation (RFC 9639 §9.2.2): the side channel carries one
# extra bit of sample depth.
# ---------------------------------------------------------------------------

_STEREO_CODES = {"left_side": 0b1000, "right_side": 0b1001,
                 "mid_side": 0b1010}


def _decorrelate(block: np.ndarray, method: str) -> list[np.ndarray]:
    left = block[:, 0].astype(np.int64)
    right = block[:, 1].astype(np.int64)
    if method == "left_side":
        return [left, left - right]
    if method == "right_side":
        return [left - right, right]
    if method == "mid_side":
        return [(left + right) >> 1, left - right]
    raise ValueError(f"unknown stereo method {method!r}")


def _recorrelate(chans: list[np.ndarray], assignment: int) -> np.ndarray:
    if assignment == 0b1000:  # left/side
        left, side = chans
        return np.stack([left, left - side], axis=1)
    if assignment == 0b1001:  # right/side
        side, right = chans
        return np.stack([side + right, right], axis=1)
    if assignment == 0b1010:  # mid/side
        mid, side = chans
        mid = (mid << 1) | (side & 1)
        return np.stack([(mid + side) >> 1, (mid - side) >> 1], axis=1)
    raise ValueError(f"flac: reserved channel assignment {assignment}")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_flac(samples: np.ndarray, sample_rate: int,
                bits_per_sample: int = 16, block_size: int = 4096,
                stereo: str = "independent", mode: str = "auto",
                lpc_order: int = 8, partition_order: int = 0,
                seek_every: int | None = None) -> bytes:
    """Integer PCM -> conformant FLAC stream.

    samples: int array, shape (n,) mono or (n, channels). mode picks the
    subframe family ('auto' = constant/best-fixed, 'lpc' = quantized
    Levinson-Durbin with fixed fallback on degenerate blocks, 'verbatim',
    'fixed'). stereo picks the §9.2.2 decorrelation for 2-channel input.
    seek_every=N emits a real SEEKTABLE block with a point every N
    frames (what makes decode_range's byte-addressed mid-stream entry
    possible — the cue-split lane's O(range) read at scale).
    Lossless by construction: parse_flac_audio returns the input exactly.
    """
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n_total, channels = x.shape
    if n_total == 0:
        raise ValueError("flac: cannot encode zero samples")
    if channels > 8:
        raise ValueError("flac: more than 8 channels")
    if stereo != "independent" and channels != 2:
        raise ValueError("flac: stereo decorrelation needs 2 channels")
    lim = 1 << (bits_per_sample - 1)
    if int(np.min(x)) < -lim or int(np.max(x)) >= lim:
        raise ValueError("flac: samples exceed bits_per_sample range")

    if block_size < 16 or block_size > 65535:
        raise ValueError("flac: block size outside STREAMINFO range")
    if not 1 <= lpc_order <= 32:
        raise ValueError("flac: LPC order must be 1..32")

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += bytes(6)  # min/max frame size unknown
    packed = (
        (sample_rate << 44) | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36) | (n_total & ((1 << 36) - 1))
    )
    si += struct.pack(">Q", packed)
    si += pcm_md5(x, bits_per_sample)
    out += bytes([0x00 if seek_every else 0x80])
    out += len(si).to_bytes(3, "big") + bytes(si)

    frames: list[bytes] = []
    seekpoints: list[tuple[int, int, int]] = []
    frame_bytes_so_far = 0
    bps_code = _BPS_CODES.get(bits_per_sample, 0)
    for frame_no, start in enumerate(range(0, n_total, block_size)):
        block = x[start : start + block_size]
        n = len(block)
        if stereo == "independent":
            chans = [block[:, c].astype(np.int64) for c in range(channels)]
            ch_assign = channels - 1
            bps_per_chan = [bits_per_sample] * channels
        else:
            chans = _decorrelate(block, stereo)
            ch_assign = _STEREO_CODES[stereo]
            side_idx = 0 if stereo == "right_side" else 1
            bps_per_chan = [
                bits_per_sample + (1 if c == side_idx else 0)
                for c in range(2)
            ]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking strategy
        w.write(0b0111, 4)  # block size: explicit 16-bit field
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(ch_assign, 4)
        w.write(bps_code, 3)
        w.write(0, 1)  # reserved
        for b in _encode_coded_number(frame_no):
            w.write(b, 8)
        w.write(n - 1, 16)
        w.write(crc8(bytes(w.out)), 8)
        part = partition_order
        while part and n % (1 << part):
            part -= 1  # short tail block: drop to a dividing order
        for ch, bps in zip(chans, bps_per_chan):
            _encode_subframe(w, ch, bps, mode, lpc_order, part)
        w.align()
        w.write(crc16(bytes(w.out)), 16)
        fb = w.bytes()
        if seek_every and frame_no % seek_every == 0:
            seekpoints.append((start, frame_bytes_so_far, n))
        frames.append(fb)
        frame_bytes_so_far += len(fb)
    if seek_every:
        pts = b"".join(struct.pack(">QQH", s, o, ns) for s, o, ns in seekpoints)
        out += bytes([0x80 | 0x03]) + len(pts).to_bytes(3, "big") + pts
    out += b"".join(frames)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_frame(bits: _Bits, info: dict) -> tuple[np.ndarray, int]:
    """One frame → (samples block, first-sample position). The position
    comes from the header's coded number: the SAMPLE number under
    variable blocking, the frame index × nominal block size under fixed
    blocking — what makes a mid-stream (seek-table) decode entry able to
    place itself without walking from the head."""
    start = bits.byte_pos()
    if bits.read(14) != 0b11111111111110:
        raise ValueError("flac: lost frame sync")
    if bits.read(1):
        raise ValueError("flac: reserved header bit set")
    variable_blocking = bits.read(1)
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_assign = bits.read(4)
    bps_code = bits.read(3)
    if bits.read(1):
        raise ValueError("flac: reserved header bit set")
    coded = bits.read_coded_number()
    if variable_blocking:
        sample_pos = coded
    elif info["nominal_block_size"]:
        sample_pos = coded * info["nominal_block_size"]
    else:
        sample_pos = None  # fixed blocking with min != max: unplaceable
    if bs_code == 0:
        raise ValueError("flac: reserved block size code")
    elif bs_code == 0b0110:
        block_size = bits.read(8) + 1
    elif bs_code == 0b0111:
        block_size = bits.read(16) + 1
    else:
        block_size = _BLOCK_SIZES[bs_code]
    if sr_code == 0b1111:
        raise ValueError("flac: invalid sample rate code")
    elif sr_code == 0b1100:
        bits.read(8)
    elif sr_code in (0b1101, 0b1110):
        bits.read(16)
    if bps_code == 0:
        bps = info["bits_per_sample"]
    elif bps_code == 0b011:
        raise ValueError("flac: reserved sample size code")
    else:
        bps = _BPS_FROM_CODE[bps_code]
    header_end = bits.byte_pos()
    if crc8(bits.data[start:header_end]) != bits.read(8):
        raise ValueError("flac: frame header CRC-8 mismatch")
    if ch_assign <= 7:
        n_chan = ch_assign + 1
        chans = [
            _decode_subframe(bits, block_size, bps) for _ in range(n_chan)
        ]
        block = np.stack(chans, axis=1)
    elif ch_assign <= 10:
        side_idx = 0 if ch_assign == 0b1001 else 1
        chans = [
            _decode_subframe(
                bits, block_size, bps + (1 if c == side_idx else 0)
            )
            for c in range(2)
        ]
        block = _recorrelate(chans, ch_assign)
    else:
        raise ValueError(f"flac: reserved channel assignment {ch_assign}")
    bits.align()
    body_end = bits.byte_pos()
    if crc16(bits.data[start:body_end]) != bits.read(16):
        raise ValueError("flac: frame CRC-16 mismatch")
    return block, sample_pos


@_valueerror_boundary
def parse_flac_audio(data: bytes | None) -> dict | None:
    """Full FLAC decode: stream bytes -> {samples (n, channels) int64,
    sample_rate, channels, bits_per_sample, n_frames}. None for non-FLAC
    input; ValueError (never IndexError or wrong PCM) on torn or
    CRC-corrupt streams. Exact: lossless inverse of encode_flac and of
    any conformant encoder within the parsed feature set."""
    info = parse_flac_metadata(data)
    if info is None:
        return None
    if not info["sample_rate"]:
        raise ValueError("flac: STREAMINFO missing or zero sample rate")
    info["nominal_block_size"] = info.get("max_block_size") or 0
    bits = _Bits(data, info["audio_offset"])
    total = info["total_samples"]
    blocks = []
    got = 0
    while (total and got < total) or (
        not total and bits.pos + 16 <= bits.n_bits
    ):
        block, _pos = _decode_frame(bits, info)
        blocks.append(block)
        got += len(block)
    if total and got != total:
        raise ValueError(
            f"flac: decoded {got} samples, STREAMINFO declared {total}"
        )
    samples = (
        np.concatenate(blocks, axis=0)
        if blocks
        else np.empty((0, info["channels"]), dtype=np.int64)
    )
    md5 = info.get("md5")
    if md5 and md5 != bytes(16):
        if pcm_md5(samples, info["bits_per_sample"]) != md5:
            raise ValueError(
                "flac: decoded PCM does not match the STREAMINFO MD5"
            )
    return {
        "samples": samples,
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bits_per_sample": info["bits_per_sample"],
        "n_frames": len(blocks),
    }


@_valueerror_boundary
def decode_range(data: bytes, start_sample: int, n_samples: int) -> np.ndarray:
    """Seek-aware partial decode: (start_sample, n_samples) → exact
    (n_samples, channels) PCM, reading ONLY from the nearest preceding
    SEEKTABLE point onward instead of the stream head. This is the
    O(track) — not O(album) — read a 100 TB cue-split wants: each task
    touches its own byte range (the reference seeks via ffmpeg -ss on
    the cue grid, CueSplitter/cue_designator.py). Placement comes from
    each frame header's coded number (frame index × nominal block size
    under fixed blocking, the sample number under variable blocking), so
    entry needs no walk from byte zero. Falls back to the audio start
    when no seek point precedes the range. MD5 is NOT checked (it covers
    the whole stream)."""
    info = parse_flac_metadata(data)
    if info is None:
        raise ValueError("not a FLAC payload")
    if not info["sample_rate"]:
        raise ValueError("flac: STREAMINFO missing or zero sample rate")
    total = info["total_samples"]
    if n_samples < 0 or start_sample < 0 or (
        total and start_sample + n_samples > total
    ):
        raise ValueError("flac: requested range outside the stream")
    if n_samples == 0:
        return np.empty((0, info["channels"]), dtype=np.int64)
    info["nominal_block_size"] = (
        info["max_block_size"]
        if info.get("min_block_size") == info.get("max_block_size")
        else 0
    )
    entry = 0
    for s, off, _ns in info["seekpoints"]:
        if s <= start_sample and off >= entry:
            entry = off
    bits = _Bits(data, info["audio_offset"] + entry)
    chunks: list[np.ndarray] = []
    end = start_sample + n_samples
    got_to = None
    while got_to is None or got_to < end:
        block, pos = _decode_frame(bits, info)
        if pos is None:
            raise ValueError(
                "flac: decode_range cannot place fixed-blocking frames "
                "when STREAMINFO min != max block size"
            )
        if got_to is None:
            if pos > start_sample:
                raise ValueError("flac: seek entry overshoots the range")
        elif pos != got_to:
            raise ValueError("flac: non-contiguous frames in range decode")
        got_to = pos + len(block)
        if got_to <= start_sample:
            continue  # seek point undershoots: skip whole frames
        lo = max(0, start_sample - pos)
        hi = min(len(block), end - pos)
        chunks.append(block[lo:hi])
    return np.concatenate(chunks, axis=0)


def flac_decode_pcm(payload: bytes) -> tuple[np.ndarray, int]:
    """(float64 mono PCM in [-1, 1), sample_rate) — the parse_wav-shaped
    convenience the audio feature/embedding lanes consume."""
    dec = parse_flac_audio(payload)
    if dec is None:
        raise ValueError("not a FLAC payload")
    scale = float(1 << (dec["bits_per_sample"] - 1))
    mono = dec["samples"].mean(axis=1) / scale
    return mono, dec["sample_rate"]
