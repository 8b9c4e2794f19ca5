"""JPEG arithmetic entropy coding (ITU-T T.81 Annexes D & F) — the QM
binary arithmetic coder with the Table D.3 probability-estimation state
machine, and the sequential-DCT statistical models (Figures F.4-F.9
encode / F.19-F.24 decode): DC difference conditioning categories with
the L/U thresholds, AC end-of-block decision trees per coefficient
index with the Kx split, and the fixed (non-adapting) sign bin.

This closes the last named image-codec boundary: ``decode_jpeg`` in
ops/imagecodec.py now decodes SOF9 (extended sequential, arithmetic)
streams natively, and ``encode_jpeg_arithmetic`` emits them, sharing
the DCT/quantizer front half with the Huffman encoder so an
arithmetic stream and a Huffman stream of the same image decode to
BIT-IDENTICAL pixels.

Everything here derives from the PUBLIC T.81 specification. The
Table D.3 values are the spec's published Qe/NMPS/NLPS/SWITCH rows
(state 113 is the fixed x'5A1D' non-adapting bin used for AC signs);
round 11 found and fixed a transcription error (an extra row near
state 88 shifting the tail) that self-round-trip could not catch
because encoder and decoder shared the broken table.
Conformance is enforced by tests/test_jpegarith.py three ways:
(1) committed known-answer vectors — libjpeg-turbo-produced
arithmetic and Huffman streams of the same image that must decode
bit-identically (no toolchain needed); (2) a SHA-256 pin of the
Table D.3 rows as dumped from the system libjpeg's jpeg_aritab;
(3) when gcc + jpeglib.h are present, a compiled C harness proving
live interop in BOTH directions — libjpeg decodes our arithmetic
streams (incl. restart markers and 4:2:0) to the same pixels as our
Huffman streams, and our decoder recovers coefficient-exact data
from libjpeg-encoded arithmetic streams.

The reference engine (andreypopp/sqlpp) ships no codecs; this extends
the multimodal decode surface (same role as ops/webpcodec.py and
ops/flaccodec.py). All entry points run inside Arrow-batched
mapInPandas — embarrassingly parallel per payload, no shuffle.
"""

from __future__ import annotations

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) for the 113 estimation
# states; index 113 is the fixed bin (never adapts) used for signs.
_QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

# T.81 F.1.4.4.1.3 / F.1.4.4.2: statistics areas. One byte per bin:
# low 7 bits = Table D.3 index, high bit = current MPS sense.
DC_STAT_BINS = 64
AC_STAT_BINS = 256
_FIXED_BIN = 113

# default conditioning bounds (Tables F.6/F.7 defaults)
DEFAULT_DC_L = 0
DEFAULT_DC_U = 1
DEFAULT_AC_KX = 5

# zigzag index -> natural (row-major) coefficient index; kept local so
# this module has no import-time dependency on imagecodec
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


class JpegArithError(ValueError):
    """Malformed arithmetic-coded JPEG entropy data."""


# ---------------------------------------------------------------------------
# QM decoder (T.81 D.2) — deferred-alignment register variant: C holds
# the raw code bytes, CT counts look-ahead bits, comparisons scale A by
# CT instead of shifting C on every renormalization.
# ---------------------------------------------------------------------------


class ArithDecoder:
    __slots__ = ("data", "pos", "c", "a", "ct", "marker_hit", "marker_pos")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.marker_hit = False
        self.marker_pos = -1
        b0 = self._next_byte()
        b1 = self._next_byte()
        self.c = (b0 << 8) | b1
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        """One entropy byte: 0xFF 0x00 unstuffs to 0xFF; a marker stops
        consumption and feeds zero bytes from then on (D.2.7)."""
        if self.marker_hit:
            return 0
        d, n, p = self.data, len(self.data), self.pos
        if p >= n:
            self.marker_hit = True
            self.marker_pos = n
            return 0
        b = d[p]
        p += 1
        if b == 0xFF:
            ff_at = p - 1
            while p < n and d[p] == 0xFF:  # fill bytes
                p += 1
            if p < n and d[p] == 0x00:
                self.pos = p + 1
                return 0xFF
            self.marker_hit = True
            self.marker_pos = ff_at
            return 0
        self.pos = p
        return b

    def decode(self, stats: bytearray, i: int) -> int:
        # deferred renormalization from the previous decision (D.2.6)
        a = self.a
        while a < 0x8000:
            if self.ct == 0:
                self.c = (self.c << 8) | self._next_byte()
                self.ct = 8
            a <<= 1
            self.ct -= 1
        sv = stats[i]
        qe, nm, nl, sw = _QE_TABLE[sv & 0x7F]
        a -= qe
        temp = a << self.ct
        if self.c >= temp:
            # code value lies in the upper (LPS-sized) subinterval:
            # conditional exchange per D.2.3
            self.c -= temp
            if a < qe:
                d = sv >> 7
                stats[i] = (sv & 0x80) | nm
            else:
                d = (sv >> 7) ^ 1
                stats[i] = ((sv ^ (0x80 if sw else 0)) & 0x80) | nl
            a = qe
        elif a < 0x8000:
            # renormalization coming: conditional MPS exchange (D.2.2)
            if a < qe:
                d = (sv >> 7) ^ 1
                stats[i] = ((sv ^ (0x80 if sw else 0)) & 0x80) | nl
            else:
                d = sv >> 7
                stats[i] = (sv & 0x80) | nm
        else:
            d = sv >> 7
        self.a = a
        return d

    def decode_fixed(self, fixed: bytearray) -> int:
        return self.decode(fixed, 0)


# ---------------------------------------------------------------------------
# QM encoder (T.81 D.1) with the stacked-0xFF carry resolution and
# 0x00 byte stuffing after literal 0xFF output bytes.
# ---------------------------------------------------------------------------


class ArithEncoder:
    __slots__ = ("a", "c", "ct", "buffer", "sc", "zc", "out")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # last pending output byte (may take a carry)
        self.sc = 0  # count of stacked 0xFF bytes awaiting carry resolution
        self.zc = 0  # pending 0x00 bytes (elided if the stream ends here)
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: resolves the pending byte upward and converts any
            # stacked 0xFF bytes to 0x00 (D.1.6)
            if self.buffer >= 0:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)  # stuff
            self.zc += self.sc
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # may still take a carry — stack it
        else:
            # no carry can reach the stacked bytes anymore: flush them
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                self._emit(self.buffer)
            if self.sc:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                while self.sc:
                    self._emit(0xFF)
                    self._emit(0x00)  # stuff
                    self.sc -= 1
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, stats: bytearray, i: int, val: int) -> None:
        sv = stats[i]
        qe, nm, nl, sw = _QE_TABLE[sv & 0x7F]
        self.a -= qe
        if val != (sv >> 7):
            # LPS: takes the upper subinterval unless conditional
            # exchange gives it the (larger) lower one (D.1.3)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            stats[i] = ((sv ^ (0x80 if sw else 0)) & 0x80) | nl
        else:
            if self.a >= 0x8000:
                return
            if self.a < qe:  # conditional exchange
                self.c += self.a
                self.a = qe
            stats[i] = (sv & 0x80) | nm
        while True:  # RENORME (D.1.6)
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    def finish(self) -> bytes:
        """FLUSH (D.1.8): pick the code point in the final interval
        with the most trailing zeros, push out remaining bytes, elide
        trailing zeros."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        if temp < self.c:
            self.c = temp + 0x8000
        else:
            self.c = temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self.buffer >= 0:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                self._emit(self.buffer)
            if self.sc:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                while self.sc:
                    self._emit(0xFF)
                    self._emit(0x00)
                    self.sc -= 1
        # trailing bytes only if non-zero (pending zeros stay elided)
        if self.c & 0x7FFF800:
            while self.zc:
                self._emit(0x00)
                self.zc -= 1
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Sequential-DCT statistical models (T.81 F.1.4.4 / F.2.4).
# ---------------------------------------------------------------------------


class _SeqStats:
    """Per-table statistics areas + per-component DC context, shared by
    encode and decode (they must walk identical bins)."""

    def __init__(self, ncomp: int) -> None:
        self.dc: dict[int, bytearray] = {}
        self.ac: dict[int, bytearray] = {}
        self.fixed = bytearray([_FIXED_BIN])
        self.dc_context = [0] * ncomp
        self.last_dc = [0] * ncomp

    def reset(self) -> None:
        for b in self.dc.values():
            b[:] = bytes(len(b))
        for b in self.ac.values():
            b[:] = bytes(len(b))
        self.fixed[0] = _FIXED_BIN
        self.dc_context = [0] * len(self.dc_context)
        self.last_dc = [0] * len(self.last_dc)

    def dc_area(self, tbl: int) -> bytearray:
        if tbl not in self.dc:
            self.dc[tbl] = bytearray(DC_STAT_BINS)
        return self.dc[tbl]

    def ac_area(self, tbl: int) -> bytearray:
        if tbl not in self.ac:
            self.ac[tbl] = bytearray(AC_STAT_BINS)
        return self.ac[tbl]


def _decode_dc(dec, stats, ci, tbl, cond) -> int:
    """Figure F.19-F.24 DC path; returns the new DC value."""
    dc_l, dc_u = cond.get(("dc", tbl), (DEFAULT_DC_L, DEFAULT_DC_U))
    st = stats.dc_area(tbl)
    base = stats.dc_context[ci]
    if dec.decode(st, base) == 0:
        stats.dc_context[ci] = 0
        return stats.last_dc[ci]
    sign = dec.decode(st, base + 1)
    s = base + 2 + sign
    m = dec.decode(st, s)
    if m:
        s = 20  # X1
        while dec.decode(st, s):
            m <<= 1
            if m == 0x8000:
                raise JpegArithError("arithmetic DC magnitude overflow")
            s += 1
    if m < ((1 << dc_l) >> 1):
        stats.dc_context[ci] = 0
    elif m > ((1 << dc_u) >> 1):
        stats.dc_context[ci] = 12 + sign * 4
    else:
        stats.dc_context[ci] = 4 + sign * 4
    v = m
    s += 14  # magnitude bits area (M1.. at X + 14)
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(st, s):
            v |= mm
    v += 1
    if sign:
        v = -v
    stats.last_dc[ci] += v
    return stats.last_dc[ci]


def _decode_ac_seq(dec, stats, tbl, cond, zz) -> None:
    """Figure F.20 sequential AC path; fills zz[1..63] (zigzag)."""
    kx = cond.get(("ac", tbl), DEFAULT_AC_KX)
    st = stats.ac_area(tbl)
    k = 1
    while k <= 63:
        s = 3 * (k - 1)
        if dec.decode(st, s):  # EOB
            break
        while dec.decode(st, s + 1) == 0:
            s += 3
            k += 1
            if k > 63:
                raise JpegArithError("arithmetic AC index overflow")
        sign = dec.decode_fixed(stats.fixed)
        s += 2
        m = dec.decode(st, s)
        if m:
            if dec.decode(st, s):
                m = 2
                s = 189 if k <= kx else 217
                while dec.decode(st, s):
                    m <<= 1
                    if m == 0x8000:
                        raise JpegArithError("arithmetic AC magnitude overflow")
                    s += 1
        v = m
        s += 14
        mm = m
        while mm > 1:
            mm >>= 1
            if dec.decode(st, s):
                v |= mm
        v += 1
        zz[k] = -v if sign else v
        k += 1


def _encode_dc(enc, stats, ci, tbl, cond, dc_val) -> None:
    dc_l, dc_u = cond.get(("dc", tbl), (DEFAULT_DC_L, DEFAULT_DC_U))
    st = stats.dc_area(tbl)
    base = stats.dc_context[ci]
    v = dc_val - stats.last_dc[ci]
    if v == 0:
        enc.encode(st, base, 0)
        stats.dc_context[ci] = 0
        return
    stats.last_dc[ci] = dc_val
    enc.encode(st, base, 1)
    if v > 0:
        enc.encode(st, base + 1, 0)
        sign = 0
    else:
        v = -v
        enc.encode(st, base + 1, 1)
        sign = 1
    s = base + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(st, s, 1)
        m = 1
        v2 = v
        s = 20
        while v2 > 1:
            v2 >>= 1
            enc.encode(st, s, 1)
            m <<= 1
            s += 1
    enc.encode(st, s, 0)
    if m < ((1 << dc_l) >> 1):
        stats.dc_context[ci] = 0
    elif m > ((1 << dc_u) >> 1):
        stats.dc_context[ci] = 12 + sign * 4
    else:
        stats.dc_context[ci] = 4 + sign * 4
    s += 14
    while m > 1:
        m >>= 1
        enc.encode(st, s, 1 if (m & v) else 0)


def _encode_ac_seq(enc, stats, tbl, cond, zz) -> None:
    kx = cond.get(("ac", tbl), DEFAULT_AC_KX)
    st = stats.ac_area(tbl)
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        s = 3 * (k - 1)
        enc.encode(st, s, 0)  # not EOB yet
        while zz[k] == 0:
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
        enc.encode(st, s + 1, 1)
        v = int(zz[k])
        if v > 0:
            enc.encode(stats.fixed, 0, 0)
            sign = 0
        else:
            v = -v
            enc.encode(stats.fixed, 0, 1)
            sign = 1
        del sign
        s += 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, s, 1)
            m = 1
            v2 = v
            if v2 > 1:
                enc.encode(st, s, 1)
                m = 2
                v2 >>= 1
                s = 189 if k <= kx else 217
                while v2 > 1:
                    v2 >>= 1
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
        enc.encode(st, s, 0)
        s += 14
        while m > 1:
            m >>= 1
            enc.encode(st, s, 1 if (m & v) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# Scan-level drivers (used by ops/imagecodec.py).
# ---------------------------------------------------------------------------


def decode_arith_scan(
    data, pos, coefs, comps, scan, mcux, mcuy, restart_interval, cond
):
    """Fill per-component zigzag coefficient grids from a sequential
    arithmetic-coded scan starting at ``pos``. Mirrors imagecodec's
    Huffman ``_decode_scan`` loop structure so the shared dequant/IDCT
    finisher applies unchanged."""
    dec = ArithDecoder(data, pos)
    stats = _SeqStats(len(comps))
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                dec = _sync_restart(dec, data)
                stats.reset()
            for ci, tdc, tac in scan:
                _cid, ch, cv, _tq = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = coefs[ci][my * cv + by, mx * ch + bx]
                        zz[0] = _decode_dc(dec, stats, ci, tdc, cond)
                        _decode_ac_seq(dec, stats, tac, cond, zz)
            mcu_i += 1


def _sync_restart(dec: ArithDecoder, data: bytes) -> ArithDecoder:
    """Find the RSTn marker the encoder placed at this interval and
    restart decoding just past it (F.2.1.3: statistics and the decoder
    registers both reset)."""
    if dec.marker_hit and dec.marker_pos >= 0:
        p = dec.marker_pos
    else:
        p = dec.pos
    n = len(data)
    while p + 1 < n and not (data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7):
        p += 1
    if p + 1 >= n:
        raise JpegArithError("expected JPEG restart marker")
    return ArithDecoder(data, p + 2)


def encode_arith_scan(
    blocks_per_comp, samp, mcux, mcuy, scan_tables, restart_interval=0
):
    """Entropy-code quantized zigzag blocks; returns the scan bytes
    (with RSTn markers when ``restart_interval`` is set)."""
    ncomp = len(blocks_per_comp)
    out = bytearray()
    enc = ArithEncoder()
    stats = _SeqStats(ncomp)
    cond: dict = {}
    mcu_i = 0
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                out += enc.finish()
                out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                enc = ArithEncoder()
                stats.reset()
            for ci in range(ncomp):
                ch, cv = samp[ci]
                tdc, tac = scan_tables[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = blocks_per_comp[ci][my * cv + by, mx * ch + bx]
                        _encode_dc(enc, stats, ci, tdc, cond, int(zz[0]))
                        _encode_ac_seq(enc, stats, tac, cond, zz)
            mcu_i += 1
    out += enc.finish()
    return bytes(out)


def parse_dac(body: bytes, cond: dict) -> None:
    """DAC segment (B.2.4.3): update conditioning bounds."""
    i = 0
    while i + 1 < len(body):
        tc, tb = body[i] >> 4, body[i] & 0xF
        v = body[i + 1]
        if tc == 0:
            dc_l, dc_u = v & 0x0F, v >> 4
            if dc_u < dc_l or dc_u > 15:
                raise JpegArithError("bad DAC DC conditioning")
            cond[("dc", tb)] = (dc_l, dc_u)
        else:
            if not 1 <= v <= 63:
                raise JpegArithError("bad DAC AC conditioning")
            cond[("ac", tb)] = v
        i += 2
