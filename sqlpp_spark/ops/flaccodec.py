"""FLAC frame decode + encode — from scratch (RFC 9639 / xiph spec).

Round-9 verdict ask #3: STREAMINFO metadata was already oracled
(`ops/audiocodec.py:flac_streaminfo`); this module decodes the FRAMES,
making `decode_audio` real for a lossless codec the way PNG made
images real. Implements the full subframe grammar of RFC 9639 §9:

- frame header: 14-bit sync, blocking strategy, coded block-size /
  sample-rate / channel-assignment / sample-size fields, UTF-8-style
  coded frame number, CRC-8 (poly 0x07)
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + shift), wasted-bits unary prefix
- residuals: Rice method 0 (4-bit params) and 1 (5-bit params),
  partition orders 0-15, escape partitions (raw n-bit residuals)
- stereo decorrelation: left/side, right/side, mid/side
- frame footer CRC-16 (poly 0x8005); STREAMINFO MD5 of the raw
  little-endian interleaved samples is verified when non-zero

The encoder emits real, spec-conformant streams (constant / verbatim /
fixed / LPC subframes chosen per block by cost, Rice partition order
0, optional mid/side) so tests and DuckDB oracles round-trip through
actual compressed frames, not headers alone.

Reference parity note: the reference repo (andreypopp/sqlpp) has no
multimodal surface at all — this extends the LLM-pipeline layer that
rounds 4-9 built beyond it (SURVEY.md §2 'beyond ref').
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from sqlpp_spark.ops.audiocodec import AudioCodecError, FLAC_SIGNATURE


class FlacError(AudioCodecError):
    """Malformed FLAC stream (subclass of AudioCodecError so existing
    guarded decode paths treat frame errors like container errors)."""


# --------------------------------------------------------------------------
# CRCs (RFC 9639 §9.2/§9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0)
# --------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list:
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
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# --------------------------------------------------------------------------
# Bit IO (MSB-first, as all FLAC fields are)
# --------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        """n-bit unsigned big-endian value."""
        v = 0
        data, pos, bit = self.data, self.pos, self.bit
        while n > 0:
            if pos >= len(data):
                raise FlacError("bitstream exhausted")
            avail = 8 - bit
            take = avail if avail < n else n
            byte = data[pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            bit += take
            if bit == 8:
                bit = 0
                pos += 1
            n -= take
        self.pos, self.bit = pos, bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit."""
        q = 0
        data, pos, bit = self.data, self.pos, self.bit
        while True:
            if pos >= len(data):
                raise FlacError("bitstream exhausted in unary code")
            byte = data[pos]
            rest = byte & ((1 << (8 - bit)) - 1)
            if rest == 0:
                q += 8 - bit
                pos += 1
                bit = 0
                continue
            top = rest.bit_length()  # position of highest set bit
            zeros = (8 - bit) - top
            q += zeros
            bit += zeros + 1
            if bit == 8:
                bit = 0
                pos += 1
            self.pos, self.bit = pos, bit
            return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# --------------------------------------------------------------------------
# Coded header fields (RFC 9639 §9.1)
# --------------------------------------------------------------------------

# block-size code -> size (None = coded explicitly after the header)
_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLERATE_FIXED = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                     6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                     11: 96000}
_SAMPLERATE_CODE = {v: k for k, v in _SAMPLERATE_FIXED.items()}
_SAMPLESIZE_FIXED = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLESIZE_CODE = {v: k for k, v in _SAMPLESIZE_FIXED.items()}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_coded_number(br: _BitReader) -> int:
    """UTF-8-style variable-length frame/sample number (§9.1.5) —
    extended to 36 bits (7 total bytes)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise FlacError("invalid coded-number prefix")
    v = first & (mask - 1)
    for _ in range(n_extra):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise FlacError("invalid coded-number continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    payloads = []
    n = v
    while True:
        payloads.append(n & 0x3F)
        n >>= 6
        n_extra = len(payloads)
        # leading byte holds (6 - n_extra) value bits after the prefix
        if n_extra <= 6 and n < (1 << max(6 - n_extra, 0)):
            break
        if n_extra > 6:
            raise FlacError("coded number exceeds 36 bits")
    n_extra = len(payloads)
    prefix = (0xFF << (7 - n_extra)) & 0xFF
    bw.write(prefix | n, 8)
    for p in reversed(payloads):
        bw.write(0x80 | p, 8)


# --------------------------------------------------------------------------
# Residual coding (§9.2.7)
# --------------------------------------------------------------------------


def _read_residual(br: _BitReader, block_size: int, pred_order: int):
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    n_part = 1 << po
    if block_size % n_part:
        raise FlacError("block size not divisible by partition count")
    part_len = block_size >> po
    out = []
    for p in range(n_part):
        count = part_len - (pred_order if p == 0 else 0)
        if count < 0:
            raise FlacError("negative partition sample count")
        param = br.read(pbits)
        if param == escape:
            nbits = br.read(5)
            if nbits == 0:
                out.extend([0] * count)
            else:
                for _ in range(count):
                    out.append(br.read_signed(nbits))
        else:
            for _ in range(count):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out.append(-(v >> 1) - 1 if v & 1 else v >> 1)
    return out


def _write_residual(bw: _BitWriter, res, method: int, param: int) -> None:
    """Single-partition (order 0) Rice residual."""
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    assert param < escape
    bw.write(method, 2)
    bw.write(0, 4)  # partition order 0
    bw.write(param, pbits)
    for v in res:
        z = 2 * v if v >= 0 else -2 * v - 1
        bw.write_unary(z >> param)
        if param:
            bw.write(z & ((1 << param) - 1), param)


def _rice_cost(zig, param: int) -> int:
    return sum((int(z) >> param) + 1 + param for z in zig)


def _best_rice_param(res) -> tuple:
    """(method, param, bit cost) for a single-partition encode."""
    zig = [2 * int(v) if v >= 0 else -2 * int(v) - 1 for v in res]
    if not zig:
        return 0, 0, 0
    mean = sum(zig) / len(zig)
    # param caps at 30 (method-1 escape is 31); clamp the search
    # window so it is never empty even for 33-bit residual magnitudes
    guess = min(max(int(mean).bit_length() - 1, 0), 30)
    best = None
    for p in range(max(0, guess - 2), min(guess + 3, 31)):
        c = _rice_cost(zig, p)
        if best is None or c < best[2]:
            method = 0 if p <= 14 else 1
            best = (method, p, c)
    return best


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> list:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    if sftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * block_size
    elif sftype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= sftype <= 12:  # FIXED order 0-4
        order = sftype - 8
        if order > block_size:
            raise FlacError("fixed order exceeds block size")
        samples = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            pos = order + i
            pred = sum(c * samples[pos - 1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif sftype >= 32:  # LPC order 1-32
        order = (sftype & 0x1F) + 1
        if order > block_size:
            raise FlacError("LPC order exceeds block size")
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise FlacError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        for i, r in enumerate(res):
            pos = order + i
            pred = sum(c * samples[pos - 1 - j]
                       for j, c in enumerate(coefs)) >> shift
            samples.append(r + pred)
    else:
        raise FlacError(f"reserved subframe type {sftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(data: bytes, pos: int, info: dict):
    """One frame at byte offset pos -> (channel-major sample lists,
    sample_rate, bps, next_pos)."""
    start = pos
    br = _BitReader(data, pos)
    sync = br.read(14)
    if sync != 0x3FFE:
        raise FlacError("lost frame sync")
    if br.read(1):
        raise FlacError("frame reserved bit set")
    br.read(1)  # blocking strategy (coded number meaning only)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise FlacError("frame header reserved bit set")
    _read_coded_number(br)
    if bs_code == 0:
        raise FlacError("reserved block size code")
    elif bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    else:
        block_size = _BLOCKSIZE_FIXED[bs_code]
    if sr_code == 0:
        sample_rate = info["sample_rate"]
    elif sr_code == 12:
        sample_rate = br.read(8) * 1000
    elif sr_code == 13:
        sample_rate = br.read(16)
    elif sr_code == 14:
        sample_rate = br.read(16) * 10
    elif sr_code == 15:
        raise FlacError("invalid sample rate code")
    else:
        sample_rate = _SAMPLERATE_FIXED[sr_code]
    if ss_code == 0:
        bps = info["bits_per_sample"]
    elif ss_code == 3:
        raise FlacError("reserved sample size code")
    else:
        bps = _SAMPLESIZE_FIXED[ss_code]
    if ch_code <= 7:
        n_channels = ch_code + 1
        stereo = None
    elif ch_code in (8, 9, 10):
        n_channels = 2
        stereo = {8: "left_side", 9: "right_side", 10: "mid_side"}[ch_code]
    else:
        raise FlacError("reserved channel assignment")
    br.align()
    header_end = br.pos
    if header_end >= len(data):
        raise FlacError("truncated frame header")
    if crc8(data[start:header_end]) != data[header_end]:
        raise FlacError("frame header CRC-8 mismatch")
    br = _BitReader(data, header_end + 1)
    channels = []
    for ch in range(n_channels):
        ch_bps = bps
        if stereo == "left_side" and ch == 1:
            ch_bps += 1
        elif stereo == "right_side" and ch == 0:
            ch_bps += 1
        elif stereo == "mid_side" and ch == 1:
            ch_bps += 1
        channels.append(_decode_subframe(br, block_size, ch_bps))
    br.align()
    body_end = br.pos
    if body_end + 2 > len(data):
        raise FlacError("truncated frame footer")
    (expected_crc16,) = struct.unpack_from(">H", data, body_end)
    if crc16(data[start:body_end]) != expected_crc16:
        raise FlacError("frame CRC-16 mismatch")
    if stereo == "left_side":
        left, side = channels
        channels = [left, [l - s for l, s in zip(left, side)]]
    elif stereo == "right_side":
        side, right = channels
        channels = [[r + s for r, s in zip(right, side)], right]
    elif stereo == "mid_side":
        mid, side = channels
        left, right = [], []
        for m, s in zip(mid, side):
            x = (m << 1) | (s & 1)
            left.append((x + s) >> 1)
            right.append((x - s) >> 1)
        channels = [left, right]
    return channels, sample_rate, bps, body_end + 2


def decode_flac(data: bytes) -> tuple:
    """Full-stream FLAC decode -> (samples, sample_rate, bps) where
    samples is an int32 ndarray of shape (n_samples, n_channels).
    Verifies per-frame CRC-8/CRC-16 and, when STREAMINFO carries a
    non-zero MD5, the decoded-audio MD5 (RFC 9639 §8.2)."""
    from sqlpp_spark.ops.audiocodec import flac_streaminfo

    info = flac_streaminfo(data)  # validates marker + STREAMINFO
    # skip the metadata block chain
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata block header")
        last = data[pos] & 0x80
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        pos += 4 + blen
        if pos > len(data):
            raise FlacError("metadata block overruns the stream")
        if last:
            break
    per_channel: list = [[] for _ in range(info["channels"])]
    while pos < len(data):
        channels, _sr, _bps, pos = _decode_frame(data, pos, info)
        if len(channels) != info["channels"]:
            raise FlacError("frame channel count differs from STREAMINFO")
        for ch, samples in zip(per_channel, channels):
            ch.extend(samples)
    n = len(per_channel[0])
    if info["total_samples"] and n != info["total_samples"]:
        raise FlacError(
            f"decoded {n} samples, STREAMINFO declares "
            f"{info['total_samples']}"
        )
    out = np.empty((n, info["channels"]), dtype=np.int64)
    for c, samples in enumerate(per_channel):
        out[:, c] = samples
    bps = info["bits_per_sample"]
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if out.size and (out.min() < lo or out.max() > hi):
        raise FlacError("decoded sample exceeds declared bit depth")
    if info["md5"] != "0" * 32:
        if bps % 8 == 0 and bps <= 32:
            width = bps // 8
            raw = _interleave_bytes(out, width)
            if hashlib.md5(raw).hexdigest() != info["md5"]:
                raise FlacError("decoded-audio MD5 mismatch")
    return out.astype(np.int32), info["sample_rate"], bps


def _interleave_bytes(samples: np.ndarray, width: int) -> bytes:
    """Channel-interleaved little-endian signed sample bytes (the MD5
    input of §8.2)."""
    flat = samples.reshape(-1)
    if width == 1:
        return flat.astype(np.int8).tobytes()
    if width == 2:
        return flat.astype("<i2").tobytes()
    if width == 4:
        return flat.astype("<i4").tobytes()
    if width == 3:
        b4 = flat.astype("<i4").tobytes()
        arr = np.frombuffer(b4, dtype=np.uint8).reshape(-1, 4)
        return arr[:, :3].tobytes()
    raise FlacError(f"unsupported sample width {width}")


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------


def _fixed_residual(samples, order: int):
    coefs = _FIXED_COEFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def _lpc_coefs(samples, order: int, precision: int = 12):
    """Quantized LPC coefficients via autocorrelation + Levinson-
    Durbin (the textbook method every FLAC encoder uses). Returns
    (qcoefs, shift) or None when the signal is degenerate."""
    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    if n <= order:
        return None
    auto = [float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)]
    if auto[0] == 0.0:
        return None
    err = auto[0]
    coefs = np.zeros(order)
    for i in range(order):
        acc = auto[i + 1]
        for j in range(i):
            acc -= coefs[j] * auto[i - j]
        k = acc / err
        new = coefs.copy()
        new[i] = k
        for j in range(i):
            new[j] = coefs[j] - k * coefs[i - 1 - j]
        coefs = new
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = float(np.max(np.abs(coefs)))
    if cmax == 0.0:
        return None
    # shift so the largest coefficient uses the full precision
    shift = precision - 1 - max(int(np.floor(np.log2(cmax))) + 1, 0)
    shift = max(0, min(shift, 15))
    q = np.round(coefs * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not np.any(q):
        return None
    return [int(v) for v in q], shift


def _lpc_residual(samples, coefs, shift: int):
    order = len(coefs)
    return [
        samples[i]
        - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
        for i in range(order, len(samples))
    ]


def _encode_subframe(bw: _BitWriter, samples, bps: int,
                     try_lpc_order: int = 0,
                     force_lpc: bool = False) -> None:
    n = len(samples)
    if not force_lpc and n and all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(samples[0], bps)
        return
    # candidate: best fixed order by single-partition rice cost
    best = None  # (cost, kind, order, extras)
    for order in range(0, min(4, n - 1) + 1):
        res = _fixed_residual(samples, order)
        method, param, cost = _best_rice_param(res)
        total = order * bps + 2 + 4 + (4 if method == 0 else 5) + cost
        if best is None or total < best[0]:
            best = (total, "fixed", order, (method, param, res))
    if try_lpc_order and n > try_lpc_order + 1:
        lpc = _lpc_coefs(samples, try_lpc_order)
        if lpc is not None:
            coefs, shift = lpc
            res = _lpc_residual(samples, coefs, shift)
            method, param, cost = _best_rice_param(res)
            total = (try_lpc_order * bps + 4 + 5 + 12 * len(coefs)
                     + 2 + 4 + (4 if method == 0 else 5) + cost)
            if total < best[0] or force_lpc:
                best = (total, "lpc", try_lpc_order,
                        (method, param, res, coefs, shift))
    verbatim_cost = n * bps
    # force_lpc is a test/oracle contract: when an LPC candidate was
    # selected it must actually be emitted as LPC, even if the cost
    # estimate says VERBATIM would be cheaper.
    if best[0] >= verbatim_cost and not (force_lpc and best[1] == "lpc"):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
        return
    if best[1] == "fixed":
        _cost, _kind, order, (method, param, res) = best
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)  # no wasted bits
        for s in samples[:order]:
            bw.write_signed(s, bps)
        _write_residual(bw, res, method, param)
    else:
        _cost, _kind, order, (method, param, res, coefs, shift) = best
        bw.write(0, 1)
        bw.write(32 + (order - 1), 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bps)
        bw.write(12 - 1, 4)  # precision code (12 bits)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, 12)
        _write_residual(bw, res, method, param)


def encode_flac(
    samples: np.ndarray, sample_rate: int, bits_per_sample: int = 16,
    block_size: int = 4096, stereo_mode: str = "independent",
    lpc_order: int = 0, force_lpc: bool = False,
) -> bytes:
    """Spec-conformant FLAC stream from an (n, channels) or (n,)
    integer sample array. Per-block, per-channel subframe choice by
    bit cost (constant / fixed 0-4 [/ LPC when ``lpc_order``>0] /
    verbatim), Rice partition order 0, fixed blocking strategy.
    ``stereo_mode`` in {independent, mid_side, left_side,
    right_side} exercises the decorrelation paths. ``force_lpc``
    emits the LPC candidate whenever one is computable regardless of
    cost — the knob the LPC-path oracle uses to guarantee LPC
    subframes are what gets hash-verified. STREAMINFO carries the
    real decoded-audio MD5."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if not (1 <= channels <= 8):
        raise FlacError("FLAC channels must be 1..8")
    if bits_per_sample not in _SAMPLESIZE_CODE:
        raise FlacError(
            f"unsupported bits per sample {bits_per_sample} "
            f"(coded sizes: {sorted(_SAMPLESIZE_CODE)})"
        )
    if stereo_mode != "independent" and channels != 2:
        raise FlacError("stereo decorrelation needs exactly 2 channels")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if n and (arr.min() < lo or arr.max() > hi):
        raise FlacError("sample exceeds the declared bit depth")
    arr = arr.astype(np.int64)

    from sqlpp_spark.ops.audiocodec import write_flac_header

    md5 = (hashlib.md5(_interleave_bytes(arr, (bits_per_sample + 7) // 8))
           .digest() if bits_per_sample % 8 == 0 else b"\x00" * 16)
    header = write_flac_header(
        sample_rate=sample_rate, channels=channels,
        bits_per_sample=bits_per_sample, total_samples=n,
        block_size=block_size, md5=md5,
    )
    out = bytearray(header)
    ch_code = {
        "independent": channels - 1,
        "left_side": 8, "right_side": 9, "mid_side": 10,
    }[stereo_mode]
    sr_code, sr_extra = _sr_coding(sample_rate)
    frame_no = 0
    for off in range(0, max(n, 1), block_size):
        block = arr[off:off + block_size]
        bs = len(block)
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(7, 4)  # 16-bit block size - 1 follows
        bw.write(sr_code, 4)
        bw.write(ch_code, 4)
        bw.write(_SAMPLESIZE_CODE[bits_per_sample], 3)
        bw.write(0, 1)
        _write_coded_number(bw, frame_no)
        bw.write(bs - 1, 16)
        if sr_extra is not None:
            bw.write(*sr_extra)
        bw.align()
        hdr = bw.getvalue()
        hdr += bytes([crc8(hdr)])
        bw = _BitWriter()
        if stereo_mode == "independent":
            chans = [(block[:, c].tolist(), bits_per_sample)
                     for c in range(channels)]
        else:
            left = block[:, 0].tolist()
            right = block[:, 1].tolist()
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                chans = [(left, bits_per_sample),
                         (side, bits_per_sample + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bits_per_sample + 1),
                         (right, bits_per_sample)]
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                chans = [(mid, bits_per_sample),
                         (side, bits_per_sample + 1)]
        for ch_samples, ch_bps in chans:
            _encode_subframe(bw, ch_samples, ch_bps, lpc_order,
                             force_lpc)
        bw.align()
        frame = hdr + bw.getvalue()
        frame += struct.pack(">H", crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)


def _sr_coding(sample_rate: int):
    """(4-bit header code, optional (value, nbits) tail field)."""
    if sample_rate in _SAMPLERATE_CODE:
        return _SAMPLERATE_CODE[sample_rate], None
    if sample_rate < (1 << 16):
        return 13, (sample_rate, 16)
    if sample_rate % 10 == 0 and sample_rate // 10 < (1 << 16):
        return 14, (sample_rate // 10, 16)
    raise FlacError(f"sample rate {sample_rate} not codable")
