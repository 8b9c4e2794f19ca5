"""Pure-Python VP8 (lossy WebP) key-frame decoder — RFC 6386.

Implements the complete intra-frame decode path: the boolean
arithmetic decoder (§7), key-frame headers (§9, §19.2), segment and
loop-filter feature parsing (§10, §9.3-9.4), key-frame intra mode
parsing with the contextual B-mode tree (§11.2), token/coefficient
decoding over the 4x8x3x11 probability lattice with per-frame updates
(§13), dequantization with the published DC/AC lookups and the Y2 /
chroma-DC special cases (§14.1), the exact integer inverse DCT/WHT
(§14.3-14.4), all 4x4 / 16x16 / chroma intra predictors including the
VP8 top-right quirks (§12), and the normal + simple in-loop
deblocking filters (§15).

The large specification constant tables live in vp8tables.py
(generated — see tools/extract_vp8_tables.py for provenance); the
small trees/tables below are the published RFC 6386 structures.

Verification: tests/test_vp8_interop.py requires BIT-EXACT Y/U/V
reconstruction agreement with the system libwebp's own decoder
(`WebPDecodeYUV`) over libwebp-ENCODED streams across qualities,
sizes, and content classes — the independent-implementation bar every
codec in this repo meets (libjpeg-turbo, libpng, libwebp-lossless).
VP8 reconstruction is normative down to the bit, so YUV equality is
the strongest possible conformance statement; RGB conversion is NOT
normative (libwebp applies its own fancy upsampler) and is documented
as this module's standard BT.601 integer conversion.

Inter frames (golden/altref reference, motion compensation) are out
of scope: WebP still images are single key frames by construction.

Scale note: like every codec here, decode is called per payload from
Arrow-batched mapInPandas (ops/multimodal.py) — embarrassingly
parallel, no shuffle, no shared state.
"""

from __future__ import annotations

import numpy as np

from .vp8tables import (
    AC_QLOOKUP,
    COEFF_DEFAULT_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)


class Vp8CodecError(Exception):
    """Malformed, truncated, or unsupported VP8 payload."""


# ---------------------------------------------------------------------------
# Boolean arithmetic decoder (RFC 6386 §7).
# ---------------------------------------------------------------------------


class _BoolReader:
    __slots__ = ("data", "pos", "range", "value", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        v = 0
        for i in range(2):
            v = (v << 8) | (data[i] if i < len(data) else 0)
        self.value = v
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return bit

    def read_bit(self) -> int:
        return self.read(128)

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read(128) else v

    def read_tree(self, tree: tuple[int, ...], probs) -> int:
        i = 0
        while True:
            i = tree[i + self.read(probs[i >> 1])]
            if i <= 0:
                return -i


# ---------------------------------------------------------------------------
# Small published tables (RFC 6386 §11.2, §13.2-13.3).
# ---------------------------------------------------------------------------

# Key-frame intra Y modes: DC=0 V=1 H=2 TM=3 B_PRED=4.
_KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)
_KF_YMODE_PROBS = (145, 156, 163, 128)
# Chroma modes: DC=0 V=1 H=2 TM=3.
_UV_MODE_TREE = (-0, 2, -1, 4, -2, -3)
_KF_UV_MODE_PROBS = (142, 114, 183)
# 4x4 sub-block modes: B_DC=0 B_TM=1 B_VE=2 B_HE=3 B_LD=4 B_RD=5
# B_VR=6 B_VL=7 B_HD=8 B_HU=9.
_BMODE_TREE = (
    -0, 2,
    -1, 4,
    -2, 6,
    8, 12,
    -3, 10,
    -5, -6,
    -4, 14,
    -7, 16,
    -8, -9,
)
# 16x16 mode → equivalent 4x4 mode for B-mode context (DC,V,H,TM).
_YMODE_TO_BMODE = (0, 2, 3, 1)
# Segment-id tree (2 bits, 3 probs).
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# Coefficient bands per zig-zag position and the zig-zag scan itself.
_COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# Token categories: (extra-bit probabilities, base value).
_CAT_PROBS = (
    ((159,), 5),
    ((165, 145), 7),
    ((173, 148, 140), 11),
    ((176, 155, 140, 135), 19),
    ((180, 157, 141, 134, 130), 35),
    ((254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129), 67),
)


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


# ---------------------------------------------------------------------------
# Frame header (RFC 6386 §9, §19.2).
# ---------------------------------------------------------------------------


class _FrameHeader:
    pass


def _parse_header(data: bytes) -> _FrameHeader:
    if len(data) < 10:
        raise Vp8CodecError("VP8 payload shorter than frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    hdr = _FrameHeader()
    hdr.key_frame = (tag & 1) == 0
    hdr.version = (tag >> 1) & 7
    hdr.show_frame = (tag >> 4) & 1
    hdr.first_part_size = tag >> 5
    if not hdr.key_frame:
        raise Vp8CodecError("only key frames occur in still WebP")
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8CodecError("bad VP8 key-frame start code")
    hdr.width = (data[6] | (data[7] << 8)) & 0x3FFF
    hdr.height = (data[8] | (data[9] << 8)) & 0x3FFF
    if hdr.width == 0 or hdr.height == 0:
        raise Vp8CodecError("zero VP8 frame dimension")
    if hdr.first_part_size == 0:
        # libwebp rejects this too: a zero-length first partition
        # cannot carry the mandatory compressed header fields.
        raise Vp8CodecError("empty first partition")
    if 10 + hdr.first_part_size > len(data):
        raise Vp8CodecError("first partition overruns payload")
    br = _BoolReader(data[10:10 + hdr.first_part_size])
    hdr.color_space = br.read_bit()
    hdr.clamping_type = br.read_bit()

    # Segmentation (§9.3).
    hdr.segmentation = br.read_bit()
    hdr.update_mb_segmentation_map = 0
    hdr.segment_abs = 0
    hdr.segment_quant = [0, 0, 0, 0]
    hdr.segment_filter = [0, 0, 0, 0]
    hdr.segment_tree_probs = [255, 255, 255]
    if hdr.segmentation:
        hdr.update_mb_segmentation_map = br.read_bit()
        update_data = br.read_bit()
        if update_data:
            hdr.segment_abs = br.read_bit()
            for i in range(4):
                if br.read_bit():
                    hdr.segment_quant[i] = br.read_signed(7)
            for i in range(4):
                if br.read_bit():
                    hdr.segment_filter[i] = br.read_signed(6)
        if hdr.update_mb_segmentation_map:
            for i in range(3):
                if br.read_bit():
                    hdr.segment_tree_probs[i] = br.read_literal(8)

    # Loop filter (§9.4).
    hdr.filter_type = br.read_bit()  # 1 = simple
    hdr.filter_level = br.read_literal(6)
    hdr.sharpness = br.read_literal(3)
    hdr.lf_delta = br.read_bit()
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta and br.read_bit():
        for i in range(4):
            if br.read_bit():
                hdr.ref_lf_deltas[i] = br.read_signed(6)
        for i in range(4):
            if br.read_bit():
                hdr.mode_lf_deltas[i] = br.read_signed(6)

    # Token partitions (§9.5).
    hdr.n_parts = 1 << br.read_literal(2)

    # Quantization (§9.6).
    hdr.y_ac_qi = br.read_literal(7)
    hdr.y_dc_delta = br.read_signed(4) if br.read_bit() else 0
    hdr.y2_dc_delta = br.read_signed(4) if br.read_bit() else 0
    hdr.y2_ac_delta = br.read_signed(4) if br.read_bit() else 0
    hdr.uv_dc_delta = br.read_signed(4) if br.read_bit() else 0
    hdr.uv_ac_delta = br.read_signed(4) if br.read_bit() else 0

    # §9.7: key frames read (and ignore for our purposes) the
    # refresh-entropy-probs flag.
    hdr.refresh_entropy = br.read_bit()

    # Coefficient probability updates (§13.4).
    probs = list(COEFF_DEFAULT_PROBS)
    for i in range(4 * 8 * 3 * 11):
        if br.read(COEFF_UPDATE_PROBS[i]):
            probs[i] = br.read_literal(8)
    # [type][band][ctx] → 11-tuple.
    hdr.coeff_probs = [
        [
            [
                tuple(probs[((t * 8 + b) * 3 + c) * 11:
                            ((t * 8 + b) * 3 + c) * 11 + 11])
                for c in range(3)
            ]
            for b in range(8)
        ]
        for t in range(4)
    ]

    hdr.mb_no_skip_coeff = br.read_bit()
    hdr.prob_skip_false = br.read_literal(8) if hdr.mb_no_skip_coeff else 0
    hdr.br = br
    return hdr


# ---------------------------------------------------------------------------
# Dequantization factors (§14.1).
# ---------------------------------------------------------------------------


def _dequant_factors(hdr, segment: int):
    if hdr.segmentation:
        if hdr.segment_abs:
            q = hdr.segment_quant[segment]
        else:
            q = hdr.y_ac_qi + hdr.segment_quant[segment]
    else:
        q = hdr.y_ac_qi
    q = _clamp_q(q)
    y1dc = DC_QLOOKUP[_clamp_q(q + hdr.y_dc_delta)]
    y1ac = AC_QLOOKUP[q]
    y2dc = DC_QLOOKUP[_clamp_q(q + hdr.y2_dc_delta)] * 2
    y2ac = AC_QLOOKUP[_clamp_q(q + hdr.y2_ac_delta)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(q + hdr.uv_dc_delta)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(q + hdr.uv_ac_delta)]
    return (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac)


# ---------------------------------------------------------------------------
# Token / coefficient decoding (§13.5).
# ---------------------------------------------------------------------------


def _decode_block_coeffs(br, probs_type, ctx, first, qdc, qac, out):
    """Decode one 4x4 block's coefficients into out[16] (natural
    order, dequantized). Returns True if any coefficient is nonzero."""
    i = first
    nonzero = False
    skip_eob = False
    while i < 16:
        p = probs_type[_COEFF_BANDS[i]][ctx]
        if not skip_eob:
            if not br.read(p[0]):
                break
        if not br.read(p[1]):
            # DCT_0: zero run continues; EOB cannot follow a zero.
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if not br.read(p[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not br.read(p[3]):
                if not br.read(p[4]):
                    val = 2
                else:
                    val = 3 if not br.read(p[5]) else 4
            else:
                if not br.read(p[6]):
                    cat = 0 if not br.read(p[7]) else 1
                else:
                    if not br.read(p[8]):
                        cat = 2 if not br.read(p[9]) else 3
                    else:
                        cat = 4 if not br.read(p[10]) else 5
                cat_probs, base = _CAT_PROBS[cat]
                extra = 0
                for cp in cat_probs:
                    extra = (extra << 1) | br.read(cp)
                val = base + extra
        if br.read_bit():
            val = -val
        out[_ZIGZAG[i]] = val * (qdc if i == 0 else qac)
        nonzero = True
        i += 1
    return nonzero


# ---------------------------------------------------------------------------
# Inverse transforms (§14.3, §14.4) — exact integer arithmetic.
# ---------------------------------------------------------------------------


def _idct4x4(b):
    """In-place 4x4 inverse DCT on a 16-int list (row-major)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = b[i] + b[8 + i]
        b1 = b[i] - b[8 + i]
        t1 = (b[4 + i] * 35468) >> 16
        t2 = b[12 + i] + ((b[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = b[4 + i] + ((b[4 + i] * 20091) >> 16)
        t2 = (b[12 + i] * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * 35468) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * 20091) >> 16)
        t2 = (tmp[r + 3] * 35468) >> 16
        d1 = t1 + t2
        b[r] = (a1 + d1 + 4) >> 3
        b[r + 3] = (a1 - d1 + 4) >> 3
        b[r + 1] = (b1 + c1 + 4) >> 3
        b[r + 2] = (b1 - c1 + 4) >> 3
    return b


def _iwht4x4(b):
    """In-place inverse Walsh-Hadamard (Y2 DC block)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = b[i] + b[12 + i]
        b1 = b[4 + i] + b[8 + i]
        c1 = b[4 + i] - b[8 + i]
        d1 = b[i] - b[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        b[r] = (a1 + b1 + 3) >> 3
        b[r + 1] = (c1 + d1 + 3) >> 3
        b[r + 2] = (a1 - b1 + 3) >> 3
        b[r + 3] = (d1 - c1 + 3) >> 3
    return b


# ---------------------------------------------------------------------------
# Intra prediction (§12). Planes are int16 numpy arrays with a 1-pixel
# top/left border (row 0 = above edge, col 0 = left edge) plus 4 extra
# columns on the right for above-right reads; pixel (x, y) of the
# image lives at plane[y+1, x+1].
# ---------------------------------------------------------------------------


def _pred_dc(plane, x, y, size, have_above, have_left):
    if have_above or have_left:
        total = 0
        n = 0
        if have_above:
            total += int(plane[y, x + 1:x + 1 + size].sum())
            n += size
        if have_left:
            total += int(plane[y + 1:y + 1 + size, x].sum())
            n += size
        dc = (total + (n >> 1)) // n
    else:
        dc = 128
    plane[y + 1:y + 1 + size, x + 1:x + 1 + size] = dc


def _pred_tm(plane, x, y, size):
    above = plane[y, x + 1:x + 1 + size].astype(np.int32)
    left = plane[y + 1:y + 1 + size, x].astype(np.int32)
    p = int(plane[y, x])
    block = left[:, None] + above[None, :] - p
    np.clip(block, 0, 255, out=block)
    plane[y + 1:y + 1 + size, x + 1:x + 1 + size] = block


def _pred_v(plane, x, y, size):
    plane[y + 1:y + 1 + size, x + 1:x + 1 + size] = \
        plane[y, x + 1:x + 1 + size]


def _pred_h(plane, x, y, size):
    plane[y + 1:y + 1 + size, x + 1:x + 1 + size] = \
        plane[y + 1:y + 1 + size, x][:, None]


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(plane, x, y, mode, tr):
    """4x4 sub-block prediction at image-coords (x, y) (plane coords
    +1). `tr` is the 4-pixel above-right array to use."""
    a = [int(v) for v in plane[y, x + 1:x + 5]]
    left = [int(v) for v in plane[y + 1:y + 5, x]]
    p = int(plane[y, x])
    ar = [int(v) for v in tr]
    out = plane[y + 1:y + 5, x + 1:x + 5]
    if mode == 0:  # B_DC_PRED
        dc = (sum(a) + sum(left) + 4) >> 3
        out[:] = dc
    elif mode == 1:  # B_TM_PRED
        av = np.array(a, np.int32)
        lv = np.array(left, np.int32)
        blk = lv[:, None] + av[None, :] - p
        np.clip(blk, 0, 255, out=blk)
        out[:] = blk
    elif mode == 2:  # B_VE_PRED
        row = [
            _avg3(p, a[0], a[1]),
            _avg3(a[0], a[1], a[2]),
            _avg3(a[1], a[2], a[3]),
            _avg3(a[2], a[3], ar[0]),
        ]
        out[:] = np.array(row, np.int16)[None, :]
    elif mode == 3:  # B_HE_PRED
        col = [
            _avg3(p, left[0], left[1]),
            _avg3(left[0], left[1], left[2]),
            _avg3(left[1], left[2], left[3]),
            _avg3(left[2], left[3], left[3]),
        ]
        out[:] = np.array(col, np.int16)[:, None]
    elif mode == 4:  # B_LD_PRED (down-left)
        e = a + ar
        out[0, 0] = _avg3(e[0], e[1], e[2])
        out[0, 1] = out[1, 0] = _avg3(e[1], e[2], e[3])
        out[0, 2] = out[1, 1] = out[2, 0] = _avg3(e[2], e[3], e[4])
        v = _avg3(e[3], e[4], e[5])
        out[0, 3] = out[1, 2] = out[2, 1] = out[3, 0] = v
        v = _avg3(e[4], e[5], e[6])
        out[1, 3] = out[2, 2] = out[3, 1] = v
        v = _avg3(e[5], e[6], e[7])
        out[2, 3] = out[3, 2] = v
        out[3, 3] = _avg3(e[6], e[7], e[7])
    elif mode == 5:  # B_RD_PRED (down-right)
        e = [left[3], left[2], left[1], left[0], p, a[0], a[1], a[2], a[3]]
        out[3, 0] = _avg3(e[0], e[1], e[2])
        out[3, 1] = out[2, 0] = _avg3(e[1], e[2], e[3])
        out[3, 2] = out[2, 1] = out[1, 0] = _avg3(e[2], e[3], e[4])
        v = _avg3(e[3], e[4], e[5])
        out[3, 3] = out[2, 2] = out[1, 1] = out[0, 0] = v
        v = _avg3(e[4], e[5], e[6])
        out[2, 3] = out[1, 2] = out[0, 1] = v
        v = _avg3(e[5], e[6], e[7])
        out[1, 3] = out[0, 2] = v
        out[0, 3] = _avg3(e[6], e[7], e[8])
    elif mode == 6:  # B_VR_PRED (vertical-right)
        e = [left[3], left[2], left[1], left[0], p, a[0], a[1], a[2], a[3]]
        out[3, 0] = _avg3(e[1], e[2], e[3])
        out[2, 0] = _avg3(e[2], e[3], e[4])
        out[3, 1] = out[1, 0] = _avg3(e[3], e[4], e[5])
        out[2, 1] = out[0, 0] = _avg2(e[4], e[5])
        out[3, 2] = out[1, 1] = _avg3(e[4], e[5], e[6])
        out[2, 2] = out[0, 1] = _avg2(e[5], e[6])
        out[3, 3] = out[1, 2] = _avg3(e[5], e[6], e[7])
        out[2, 3] = out[0, 2] = _avg2(e[6], e[7])
        out[1, 3] = _avg3(e[6], e[7], e[8])
        out[0, 3] = _avg2(e[7], e[8])
    elif mode == 7:  # B_VL_PRED (vertical-left)
        e = a + ar
        out[0, 0] = _avg2(e[0], e[1])
        out[1, 0] = _avg3(e[0], e[1], e[2])
        out[2, 0] = out[0, 1] = _avg2(e[1], e[2])
        out[1, 1] = out[3, 0] = _avg3(e[1], e[2], e[3])
        out[2, 1] = out[0, 2] = _avg2(e[2], e[3])
        out[3, 1] = out[1, 2] = _avg3(e[2], e[3], e[4])
        out[2, 2] = out[0, 3] = _avg2(e[3], e[4])
        out[3, 2] = out[1, 3] = _avg3(e[3], e[4], e[5])
        out[2, 3] = _avg3(e[4], e[5], e[6])
        out[3, 3] = _avg3(e[5], e[6], e[7])
    elif mode == 8:  # B_HD_PRED (horizontal-down)
        e = [left[3], left[2], left[1], left[0], p, a[0], a[1], a[2]]
        out[0, 0] = _avg2(e[3], e[4])
        out[0, 1] = _avg3(e[3], e[4], e[5])
        out[0, 2] = _avg3(e[4], e[5], e[6])
        out[0, 3] = _avg3(e[5], e[6], e[7])
        out[1, 0] = _avg2(e[2], e[3])
        out[1, 1] = _avg3(e[2], e[3], e[4])
        out[1, 2] = out[0, 0]
        out[1, 3] = out[0, 1]
        out[2, 0] = _avg2(e[1], e[2])
        out[2, 1] = _avg3(e[1], e[2], e[3])
        out[2, 2] = out[1, 0]
        out[2, 3] = out[1, 1]
        out[3, 0] = _avg2(e[0], e[1])
        out[3, 1] = _avg3(e[0], e[1], e[2])
        out[3, 2] = out[2, 0]
        out[3, 3] = out[2, 1]
    else:  # B_HU_PRED (horizontal-up)
        l0, l1, l2, l3 = left
        out[0, 0] = _avg2(l0, l1)
        out[0, 1] = _avg3(l0, l1, l2)
        out[0, 2] = out[1, 0] = _avg2(l1, l2)
        out[0, 3] = out[1, 1] = _avg3(l1, l2, l3)
        out[1, 2] = out[2, 0] = _avg2(l2, l3)
        out[1, 3] = out[2, 1] = _avg3(l2, l3, l3)
        out[2, 2] = out[2, 3] = l3
        out[3, 0] = out[3, 1] = out[3, 2] = out[3, 3] = l3


# ---------------------------------------------------------------------------
# Loop filter (§15).
# ---------------------------------------------------------------------------


def _edge_normal(seg, elimit, ilimit, thresh, mb_edge):
    """Vectorized normal-filter for one edge. ``seg`` is an (n, 8)
    int32 array of [p3 p2 p1 p0 q0 q1 q2 q3] per crossing line;
    modified in place (RFC 6386 §15.2-15.3, exact integer)."""
    d = np.diff(seg, axis=1)
    ad = np.abs(d)
    mask = (
        (np.abs(seg[:, 3] - seg[:, 4]) * 2
         + (np.abs(seg[:, 2] - seg[:, 5]) >> 1) <= elimit)
        & (ad[:, 0] <= ilimit) & (ad[:, 1] <= ilimit)
        & (ad[:, 2] <= ilimit) & (ad[:, 4] <= ilimit)
        & (ad[:, 5] <= ilimit) & (ad[:, 6] <= ilimit)
    )
    if not mask.any():
        return
    hev = (ad[:, 2] > thresh) | (ad[:, 4] > thresh)
    s = seg - 128
    p2, p1, p0 = s[:, 1], s[:, 2], s[:, 3]
    q0, q1, q2 = s[:, 4], s[:, 5], s[:, 6]

    def c8(v):
        return np.clip(v, -128, 127)

    # Outer-tap adjustment: hev lines of both filters, and ALL masked
    # lines of the sub-block filter get (a+1)>>1 applied to p1/q1 too.
    a = c8(c8(p1 - q1) + 3 * (q0 - p0))
    f1 = c8(a + 4) >> 3
    f2 = c8(a + 3) >> 3
    sel = mask & hev
    if not mb_edge:
        # Sub-block filter: non-hev lines drop the outer tap and also
        # nudge p1/q1 by (F1+1)>>1.
        a_in = c8(3 * (q0 - p0))
        f1_in = c8(a_in + 4) >> 3
        f2_in = c8(a_in + 3) >> 3
        f1 = np.where(hev, f1, f1_in)
        f2 = np.where(hev, f2, f2_in)
        sel = mask
    nq0 = np.where(sel, c8(q0 - f1), q0)
    np0 = np.where(sel, c8(p0 + f2), p0)
    if not mb_edge:
        nudge = (f1 + 1) >> 1
        inner = mask & ~hev
        seg[:, 5] = np.where(inner, c8(q1 - nudge), q1) + 128
        seg[:, 2] = np.where(inner, c8(p1 + nudge), p1) + 128
        seg[:, 4] = nq0 + 128
        seg[:, 3] = np0 + 128
        return
    # MB edge: hev lines got the 4-tap adjustment above; non-hev lines
    # take the 6-tap wide filter on p2..q2.
    wide = mask & ~hev
    w = c8(c8(p1 - q1) + 3 * (q0 - p0))
    a27 = (27 * w + 63) >> 7
    a18 = (18 * w + 63) >> 7
    a9 = (9 * w + 63) >> 7
    seg[:, 4] = np.where(wide, c8(q0 - a27), nq0) + 128
    seg[:, 3] = np.where(wide, c8(p0 + a27), np0) + 128
    seg[:, 5] = np.where(wide, c8(q1 - a18), q1) + 128
    seg[:, 2] = np.where(wide, c8(p1 + a18), p1) + 128
    seg[:, 6] = np.where(wide, c8(q2 - a9), q2) + 128
    seg[:, 1] = np.where(wide, c8(p2 + a9), p2) + 128


def _edge_simple(seg4, limit):
    """Vectorized simple filter: (n, 4) int32 [p1 p0 q0 q1]."""
    mask = (np.abs(seg4[:, 1] - seg4[:, 2]) * 2
            + (np.abs(seg4[:, 0] - seg4[:, 3]) >> 1) <= limit)
    if not mask.any():
        return
    s = seg4 - 128
    p1, p0, q0, q1 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]

    def c8(v):
        return np.clip(v, -128, 127)

    a = c8(c8(p1 - q1) + 3 * (q0 - p0))
    f1 = c8(a + 4) >> 3
    f2 = c8(a + 3) >> 3
    seg4[:, 2] = np.where(mask, c8(q0 - f1), q0) + 128
    seg4[:, 1] = np.where(mask, c8(p0 + f2), p0) + 128


def _filter_v(plane, r0, r1, x, elimit, ilimit, thresh, mb_edge):
    """Normal-filter the vertical edge at column x, rows [r0, r1)."""
    seg = plane[r0:r1, x - 4:x + 4].astype(np.int32)
    _edge_normal(seg, elimit, ilimit, thresh, mb_edge)
    plane[r0:r1, x - 4:x + 4] = seg


def _filter_h(plane, y, c0, c1, elimit, ilimit, thresh, mb_edge):
    """Normal-filter the horizontal edge at row y, cols [c0, c1)."""
    seg = plane[y - 4:y + 4, c0:c1].T.astype(np.int32)
    _edge_normal(seg, elimit, ilimit, thresh, mb_edge)
    plane[y - 4:y + 4, c0:c1] = seg.T


# ---------------------------------------------------------------------------
# Decoder driver.
# ---------------------------------------------------------------------------


def decode_vp8(data: bytes):
    """Decode a VP8 key frame to (y, u, v) uint8 planes of shapes
    (h, w), (⌈h/2⌉, ⌈w/2⌉), (⌈h/2⌉, ⌈w/2⌉)."""
    hdr = _parse_header(data)
    w, h = hdr.width, hdr.height
    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4
    if (mb_w * 16) * (mb_h * 16) > (1 << 26):
        raise Vp8CodecError("VP8 dimensions exceed the decode limit")

    # Token partitions.
    body = data[10 + hdr.first_part_size:]
    n = hdr.n_parts
    if len(body) < 3 * (n - 1):
        raise Vp8CodecError("token partition directory truncated")
    sizes = []
    pos = 3 * (n - 1)
    for i in range(n - 1):
        sz = body[3 * i] | (body[3 * i + 1] << 8) | (body[3 * i + 2] << 16)
        sizes.append(sz)
    parts = []
    for i in range(n):
        if i < n - 1:
            end = pos + sizes[i]
            if end > len(body):
                raise Vp8CodecError("token partition overruns payload")
            parts.append(_BoolReader(body[pos:end]))
            pos = end
        else:
            parts.append(_BoolReader(body[pos:]))

    br = hdr.br

    # ---- Pass 1: per-MB mode info from the first partition. ----
    mbs = []
    above_bmodes = [[0] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_bmodes = [0, 0, 0, 0]
        for mb_x in range(mb_w):
            seg = 0
            if hdr.update_mb_segmentation_map:
                seg = br.read_tree(_SEGMENT_TREE, hdr.segment_tree_probs)
            skip = br.read(hdr.prob_skip_false) if hdr.mb_no_skip_coeff else 0
            ymode = br.read_tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            bmodes = None
            if ymode == 4:  # B_PRED
                bmodes = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        above = (above_bmodes[mb_x][sx] if sy == 0
                                 else bmodes[(sy - 1) * 4 + sx])
                        left = (left_bmodes[sy] if sx == 0
                                else bmodes[sy * 4 + sx - 1])
                        base = (above * 10 + left) * 9
                        bm = br.read_tree(
                            _BMODE_TREE, KF_BMODE_PROBS[base:base + 9]
                        )
                        bmodes[sy * 4 + sx] = bm
                above_bmodes[mb_x] = bmodes[12:16]
                left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                bm = _YMODE_TO_BMODE[ymode]
                above_bmodes[mb_x] = [bm] * 4
                left_bmodes = [bm] * 4
            uvmode = br.read_tree(_UV_MODE_TREE, _KF_UV_MODE_PROBS)
            mbs.append((seg, skip, ymode, bmodes, uvmode))

    # ---- Pass 2: residuals + reconstruction. ----
    # Planes with a 1-px top/left border and 4 extra right columns.
    yp = np.empty((mb_h * 16 + 1, mb_w * 16 + 5), np.int16)
    up = np.empty((mb_h * 8 + 1, mb_w * 8 + 5), np.int16)
    vp = np.empty((mb_h * 8 + 1, mb_w * 8 + 5), np.int16)
    for pl in (yp, up, vp):
        pl[:, 0] = 129
        pl[0, :] = 127

    dequants = [_dequant_factors(hdr, s) for s in range(4)]

    # Nonzero contexts.
    nz_y_above = np.zeros((mb_w, 4), np.uint8)
    nz_u_above = np.zeros((mb_w, 2), np.uint8)
    nz_v_above = np.zeros((mb_w, 2), np.uint8)
    nz_y2_above = np.zeros(mb_w, np.uint8)

    has_coeffs_map = np.zeros((mb_h, mb_w), bool)
    coeffs = [[0] * 16 for _ in range(25)]  # 16 Y + 4 U + 4 V + Y2

    for mb_y in range(mb_h):
        tbr = parts[mb_y % n]
        nz_y_left = [0, 0, 0, 0]
        nz_u_left = [0, 0]
        nz_v_left = [0, 0]
        nz_y2_left = 0
        for mb_x in range(mb_w):
            seg, skip, ymode, bmodes, uvmode = mbs[mb_y * mb_w + mb_x]
            (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac) = dequants[seg]
            have_y2 = ymode != 4
            block_nz = [False] * 25
            if skip:
                nz_y_left = [0, 0, 0, 0]
                nz_u_left = [0, 0]
                nz_v_left = [0, 0]
                nz_y_above[mb_x] = 0
                nz_u_above[mb_x] = 0
                nz_v_above[mb_x] = 0
                if have_y2:
                    nz_y2_left = 0
                    nz_y2_above[mb_x] = 0
                for c in coeffs:
                    for k in range(16):
                        c[k] = 0
                mb_has = False
            else:
                for c in coeffs:
                    for k in range(16):
                        c[k] = 0
                probs = hdr.coeff_probs
                if have_y2:
                    ctx = nz_y2_left + nz_y2_above[mb_x]
                    nz = _decode_block_coeffs(
                        tbr, probs[1], ctx, 0, y2dc, y2ac, coeffs[24]
                    )
                    nz_y2_left = nz_y2_above[mb_x] = int(nz)
                    block_nz[24] = nz
                    ytype = 0
                    first = 1
                else:
                    ytype = 3
                    first = 0
                for sy in range(4):
                    for sx in range(4):
                        bi = sy * 4 + sx
                        ctx = ((nz_y_left[sy] if sx == 0
                                else block_nz[bi - 1])
                               + (nz_y_above[mb_x][sx] if sy == 0
                                  else block_nz[bi - 4]))
                        nz = _decode_block_coeffs(
                            tbr, probs[ytype], int(ctx), first,
                            y1dc, y1ac, coeffs[bi]
                        )
                        block_nz[bi] = nz
                for plane_idx, (nzl, nza) in (
                    (0, (nz_u_left, nz_u_above)),
                    (1, (nz_v_left, nz_v_above)),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            bi = 16 + plane_idx * 4 + sy * 2 + sx
                            ctx = ((nzl[sy] if sx == 0
                                    else block_nz[bi - 1])
                                   + (nza[mb_x][sx] if sy == 0
                                      else block_nz[bi - 2]))
                            nz = _decode_block_coeffs(
                                tbr, probs[2], int(ctx), 0,
                                uvdc, uvac, coeffs[bi]
                            )
                            block_nz[bi] = nz
                for sy in range(4):
                    nz_y_left[sy] = int(block_nz[sy * 4 + 3])
                for sx in range(4):
                    nz_y_above[mb_x][sx] = int(block_nz[12 + sx])
                nz_u_left[0] = int(block_nz[17])
                nz_u_left[1] = int(block_nz[19])
                nz_u_above[mb_x][0] = int(block_nz[18])
                nz_u_above[mb_x][1] = int(block_nz[19])
                nz_v_left[0] = int(block_nz[21])
                nz_v_left[1] = int(block_nz[23])
                nz_v_above[mb_x][0] = int(block_nz[22])
                nz_v_above[mb_x][1] = int(block_nz[23])
                if have_y2 and block_nz[24]:
                    _iwht4x4(coeffs[24])
                    for k in range(16):
                        coeffs[k][0] = coeffs[24][k]
                        block_nz[k] = block_nz[k] or coeffs[24][k] != 0
                mb_has = any(block_nz[:24])
            has_coeffs_map[mb_y, mb_x] = mb_has

            # ---- Reconstruction. ----
            bx = mb_x * 16
            by = mb_y * 16
            have_above = mb_y > 0
            have_left = mb_x > 0
            # Luma edge conventions: the virtual border rows/cols
            # already hold 127 / 129.
            # Save the MB top-right 4 px for the c==3, r>0 quirk
            # (sub-blocks below the top row keep using the MB's own
            # top-right pixels, never fresher in-MB reconstruction).
            tr_save = yp[by, bx + 17:bx + 21].copy()
            if ymode == 4:
                for sy in range(4):
                    for sx in range(4):
                        x = bx + sx * 4
                        y = by + sy * 4
                        if sy == 0:
                            tr = yp[y, x + 5:x + 9]
                        elif sx == 3:
                            tr = tr_save
                        else:
                            tr = yp[y, x + 5:x + 9]
                        _pred_b(yp, x, y, bmodes[sy * 4 + sx], tr)
                        blk = coeffs[sy * 4 + sx]
                        if block_nz[sy * 4 + sx]:
                            _idct4x4(blk)
                            sub = yp[y + 1:y + 5, x + 1:x + 5]
                            # int32: hostile streams can code values
                            # whose dequantized magnitude overflows
                            # int16 (pixels are clipped either way,
                            # but the math must not wrap).
                            res = np.array(blk, np.int32).reshape(4, 4)
                            sub[:] = np.clip(sub.astype(np.int32) + res,
                                             0, 255)
            else:
                if ymode == 0:
                    _pred_dc(yp, bx, by, 16, have_above, have_left)
                elif ymode == 1:
                    _pred_v(yp, bx, by, 16)
                elif ymode == 2:
                    _pred_h(yp, bx, by, 16)
                else:
                    _pred_tm(yp, bx, by, 16)
                for sy in range(4):
                    for sx in range(4):
                        bi = sy * 4 + sx
                        if not block_nz[bi]:
                            continue
                        blk = coeffs[bi]
                        _idct4x4(blk)
                        x = bx + sx * 4
                        y = by + sy * 4
                        sub = yp[y + 1:y + 5, x + 1:x + 5]
                        res = np.array(blk, np.int32).reshape(4, 4)
                        sub[:] = np.clip(sub.astype(np.int32) + res, 0, 255)
            # Chroma.
            cx = mb_x * 8
            cy = mb_y * 8
            for plane, base in ((up, 16), (vp, 20)):
                if uvmode == 0:
                    _pred_dc(plane, cx, cy, 8, have_above, have_left)
                elif uvmode == 1:
                    _pred_v(plane, cx, cy, 8)
                elif uvmode == 2:
                    _pred_h(plane, cx, cy, 8)
                else:
                    _pred_tm(plane, cx, cy, 8)
                for sy in range(2):
                    for sx in range(2):
                        bi = base + sy * 2 + sx
                        if not block_nz[bi]:
                            continue
                        blk = coeffs[bi]
                        _idct4x4(blk)
                        x = cx + sx * 4
                        y = cy + sy * 4
                        sub = plane[y + 1:y + 5, x + 1:x + 5]
                        res = np.array(blk, np.int32).reshape(4, 4)
                        sub[:] = np.clip(sub.astype(np.int32) + res, 0, 255)
        # Extend each reconstructed row past the right edge with its
        # last macroblock pixel: the above-right pixels of the next
        # MB row's rightmost macroblock read from these columns.
        rows = slice(mb_y * 16 + 1, mb_y * 16 + 17)
        yp[rows, mb_w * 16 + 1:] = yp[rows, mb_w * 16][:, None]

    # ---- Loop filter. ----
    if hdr.filter_level:
        _loop_filter(hdr, yp, up, vp, mbs, has_coeffs_map, mb_w, mb_h)

    y = yp[1:h + 1, 1:w + 1].astype(np.uint8)
    cw = (w + 1) >> 1
    ch = (h + 1) >> 1
    u = up[1:ch + 1, 1:cw + 1].astype(np.uint8)
    v = vp[1:ch + 1, 1:cw + 1].astype(np.uint8)
    return y, u, v


def _loop_filter(hdr, yp, up, vp, mbs, has_coeffs_map, mb_w, mb_h):
    simple = hdr.filter_type == 1
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            seg, skip, ymode, bmodes, uvmode = mbs[mb_y * mb_w + mb_x]
            level = hdr.filter_level
            if hdr.segmentation:
                if hdr.segment_abs:
                    level = hdr.segment_filter[seg]
                else:
                    level = level + hdr.segment_filter[seg]
                level = 0 if level < 0 else 63 if level > 63 else level
            if hdr.lf_delta:
                level += hdr.ref_lf_deltas[0]  # intra frame
                if ymode == 4:
                    level += hdr.mode_lf_deltas[0]  # B_PRED
                level = 0 if level < 0 else 63 if level > 63 else level
            if level == 0:
                continue
            interior = level
            if hdr.sharpness:
                interior >>= 2 if hdr.sharpness > 4 else 1
                if interior > 9 - hdr.sharpness:
                    interior = 9 - hdr.sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_elimit = (level + 2) * 2 + interior
            sub_elimit = level * 2 + interior
            inner = has_coeffs_map[mb_y, mb_x] or ymode == 4
            if simple:
                # The simple filter uses the same edge limits as the
                # normal filter (interior-limit term included).
                _filter_mb_simple(yp, mb_x, mb_y, mb_elimit, sub_elimit,
                                  inner)
            else:
                _filter_mb_full(
                    yp, up, vp, mb_x, mb_y,
                    mb_elimit, sub_elimit, interior, hev_t, inner
                )


def _filter_mb_full(yp, up, vp, mb_x, mb_y, mbe, sube, ilim, hev_t, inner):
    by = mb_y * 16 + 1
    bx = mb_x * 16 + 1
    cy = mb_y * 8 + 1
    cx = mb_x * 8 + 1
    # Vertical edges (across columns), then horizontal — per MB, in
    # raster order, matching the normative filtering sequence. Each
    # edge's crossing lines are independent → vectorized.
    if mb_x > 0:
        _filter_v(yp, by, by + 16, bx, mbe, ilim, hev_t, True)
        _filter_v(up, cy, cy + 8, cx, mbe, ilim, hev_t, True)
        _filter_v(vp, cy, cy + 8, cx, mbe, ilim, hev_t, True)
    if inner:
        for dx in (4, 8, 12):
            _filter_v(yp, by, by + 16, bx + dx, sube, ilim, hev_t, False)
        _filter_v(up, cy, cy + 8, cx + 4, sube, ilim, hev_t, False)
        _filter_v(vp, cy, cy + 8, cx + 4, sube, ilim, hev_t, False)
    if mb_y > 0:
        _filter_h(yp, by, bx, bx + 16, mbe, ilim, hev_t, True)
        _filter_h(up, cy, cx, cx + 8, mbe, ilim, hev_t, True)
        _filter_h(vp, cy, cx, cx + 8, mbe, ilim, hev_t, True)
    if inner:
        for dy in (4, 8, 12):
            _filter_h(yp, by + dy, bx, bx + 16, sube, ilim, hev_t, False)
        _filter_h(up, cy + 4, cx, cx + 8, sube, ilim, hev_t, False)
        _filter_h(vp, cy + 4, cx, cx + 8, sube, ilim, hev_t, False)


def _filter_mb_simple(yp, mb_x, mb_y, mbe, sube, inner):
    by = mb_y * 16 + 1
    bx = mb_x * 16 + 1
    if mb_x > 0:
        seg = yp[by:by + 16, bx - 2:bx + 2].astype(np.int32)
        _edge_simple(seg, mbe)
        yp[by:by + 16, bx - 2:bx + 2] = seg
    if inner:
        for dx in (4, 8, 12):
            seg = yp[by:by + 16, bx + dx - 2:bx + dx + 2].astype(np.int32)
            _edge_simple(seg, sube)
            yp[by:by + 16, bx + dx - 2:bx + dx + 2] = seg
    if mb_y > 0:
        seg = yp[by - 2:by + 2, bx:bx + 16].T.astype(np.int32)
        _edge_simple(seg, mbe)
        yp[by - 2:by + 2, bx:bx + 16] = seg.T
    if inner:
        for dy in (4, 8, 12):
            seg = yp[by + dy - 2:by + dy + 2, bx:bx + 16].T.astype(np.int32)
            _edge_simple(seg, sube)
            yp[by + dy - 2:by + dy + 2, bx:bx + 16] = seg.T


def vp8_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Standard BT.601 full-range integer conversion with nearest
    chroma upsampling. NOT normative (RFC 6386 §2 leaves the RGB
    conversion to the application; libwebp uses its own fancy
    upsampler) — conformance is stated on the YUV planes."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    yy = y.astype(np.int32)
    c = yy - 16
    d = uu - 128
    e = vv - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    out = np.stack([r, g, b], axis=-1)
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# Committed conformance streams: libwebp 1.2.4 lossy encodes whose
# decode was verified BIT-EXACT against WebPDecodeYUV (see
# tests/test_vp8_interop.py). They anchor the known-answer tests, the
# container mutation fuzzer, and the multimodal_webp_lossy_oracle
# registry row in environments without the library. Shapes (h, w):
# noise48_q75 (48, 48) B_PRED-heavy; grad64x80_q40 (64, 80)
# 16x16-mode + strong loop filter; mixed33x47_q90 (33, 47) odd
# geometry, partial edge macroblocks.
# ---------------------------------------------------------------------------

CONFORMANCE_STREAMS = {
    "noise48_q75": (
        b'UklGRogGAABXRUJQVlA4IHwGAACwGwCdASowADAAAgA0JbACdMoQQFqY6FYW8gQY'
        b'DlgPUB5gOgB6AH9z/rvqV+oB+03sAeaz/r/3g+Ab+y/6v2B/21///sAegBpgu0rE'
        b'Fx9+qfz/gCeAeAH1bjBOZOCf2BWb/0bvlfqj4YWoF3l/03qi/l3mX/LfAG+ef2T2'
        b'AP41/Sf+N/g/cq/XP+Z/aPML+Sf0z/qf334Af5P/TP+p/ePZs9aX6veyJ+tB5Voz'
        b'0jQWPHTWgko0o9l1t1I1SvuoQRL/7sKKfJMnWhFyrA8x27URQddXQ0dPN2IbaDdu'
        b'VceVQNzWOwZXAADfVRwrfDLbyYf/GvaC+hwxOukpYumw91NeUP4QHRpQzg8e72d/'
        b'L16jTNpfWlFRthEgA3SlupTeItorLYaaL/BYatJqLHdQGwZDobuV0K+PSij/pgHV'
        b'C1ioNwXCymtUxdFTIRDPtIYINUZhMtCqbreMTD7Tz/ktPY/9kwKKeq8pGDyltK56'
        b'HrgeW/01TT2Ch6IsLGXjmsBM6bB3PTiGNNItnHvvlS74bDRYt7xDy8rdvvokZRt1'
        b'pqbhxK+GWkL9ik9T/0+fjqcv1kghkJmUSyVne6+3NZcZAyAbJHq/aoAuROpr0eHA'
        b'od5V3VgwNp9eSkpLPPzFuU8nRXB+4yZ7J0MjM9iA+KEhIN/O1+V3ZwvY4UvD3Jvc'
        b'PVV8EwJN4hNPcYqmGSPErg3PwIduRYDt+4nt5hTibYtXNGwNM1RrFZa1DwA4XyGE'
        b'dBI7ieM3iNpGcMXFPM1ff0lHtgdszj3dj30AjlYqvIc8Se4M5altOz+8GE/r9nEB'
        b'nvvkseZb+AdACPw0su0OGznvpZPOCuyXH5fKLxN9gltwOMGc2PYUxi+RDTL3CZR+'
        b'/gx8If+MLpUOV1Tl7X/8exCPvmplcjMyTKffqOAsdTFx4r1MGhA9q28ngBoY+Nrl'
        b'ctFxs1oUAOWvdfPD9oullYE3mVbnYu8FqOxs7wHON4idoly60GAuEXHkT+BNLGW2'
        b'wr82QaWD1LtITy3JrkshqLdR1TBCFFRqNWg/SktYJ0hBBjfInKJmSr6rYkRAiBvD'
        b'qjGLnapwIWYKmejL82kRao1c4wKJJW5PL9cd7eR38HWthxoR/WbK8pggtTtL7NOL'
        b'UNWylrM97QHGSAfNJITSI5g3NOqDhWisLeWlZZEjiDrmF2slTZgoziEasokKye6m'
        b'w9R/qNtlw9wkzIWyYTsblivJki80kjOkbwNEYzFsVLd17p2uodmnmV+q9V5PepnS'
        b'BZ5qYk3KlV92Eo535gZQOY0e0LwDgt2vUVxexr1G0UZm6G1Kkqbok+YtoDrPxpzm'
        b'SgOrN6NMXQC45aYCrbVFjciru2AKTE+63EeoB5UuP5U/0qwRYboGd4I+q/9QzXVF'
        b'BxjMXZnd/meGybBfzUWuy7V7U2vcuTFaEed0gzuClWEDiJteZc+evrVCk/oh4atQ'
        b'2wu1nqtNHcznKY/6oXwdWYyn6cKLE4ggNydhtaGURJQl0gq8tAhgcE4X3F8HrkXT'
        b'UUeaxdtGCIOpIcn/pku1ccRYB1HhlYlYfdWZXBvknhKTkFlpg1htINrT6DTUACwD'
        b'gzrG120rUTq2cXmi0TV0cleWdOzDvkMcpg//SFj7q3agVYnwgHq7HIp1fI+zXPOa'
        b'ITPjZWfeX1njxZ607X2jfEVqkvNxWnDL2nh/dUw8N2y5Wgu6VH2W/QfBNtvyk9FH'
        b'T4fhYlKI228zbTLCh76l9ZK3C7QSEikFbCL9818Lwp+H+askBzbQm4D7WE69e+A9'
        b'4oLRqY29Kelb4Nt/wGhcusDmXzK6Q4jhfaDEYZFWzfRgwqoEHkAiQXj8K7j4b/dp'
        b'+tE5XDVppY0aZRmZt4bPipLtAJvsWZfJ1xqdaK6y6ZOhprNGu6DxbiqTgybxZLu1'
        b'qMcUQhoLo3XIrS/mErlL/iYguLo9IbIlMm92Q+ANo3DBpas/qiu8SGzbI9mD88lz'
        b'5iR73NEc8N2C//mwainbFgi1mcWf+P3Sb9RXDb7xx32kEiQ/Rt4fnXy3jtX3z1Tf'
        b'wYVrSqsLjHIV7LCg2j9ILGb13mNodvFNTSEDQEnBXvtsiw9/waKuxbj1yzdtKjVp'
        b'/MUYSx/swjQBUZ1NtGoPtIAYXQE9gAJ7papfxUWf37JhSkuTfsOqWvqb4dNRc6JE'
        b'jJTI3zKfaklnD7kO5J2eZy5MkSH8JG73stySv5bHY2j/esoVHaVM3d8fDGwpvcAA'
    ),
    "grad64x80_q40": (
        b'UklGRswAAABXRUJQVlA4IMAAAADwBgCdASpQAEAAPu12s1Qpv6S/pnQIA/AdiWIG'
        b'WAWKuDriiZisiYAAl2zERZ2u//9XmGOhX//r6yv9itDH85NgAP7zusvzE4vxWhwV'
        b'NAQfOty+A4TpMbihFqpdcwYd9cfryGzf3WkCurCW/6AYyv/RYewtwlOddHrVZ53j'
        b'HcDQdrMVFsfN0mqyi4jyyiHFdhGVC3DYknZDDYbd1keYa43yj9RH5ZSA7eJl8+0g'
        b'v69m9qGUB5ZoWh4Gq1H3KwrOQAA='
    ),
    "mixed33x47_q90": (
        b'UklGRnQEAABXRUJQVlA4IGgEAAAwFgCdASovACEAPi0ShkKhoQ1XVgAMAWJbACdM'
        b'oR9V53+DX5HfIJRf5h+F/xg3REgXZFpg9AH+13SHmA8lv/G/y/3AeTN1m3oAfrd1'
        b'lv9y/53o3XcTiC5WwAzgPrGGB2BHd/MDiM/0XgDeO+Vv7J/8j+z/mU+gf2V+A/ys'
        b'/WZ+tnsufrkPtpMvMCXx1nb9KzqrK9tNy3VsSIDuxMVElxqaD+3LcK9sKovwSTed'
        b'zmML0dtKM9phf4ijpYAA/sMuj+mEbqW1yMHzC3VE6cJtq7O4qSz9zVs+MUier/bU'
        b'6GAMylnfvb6Ov+ns9HSuFav64+nyHLJXmStd97zi5VvSF03HAtJVjvIHDw5Wzxrr'
        b'bYP3u58cnb/SWf/4ZY3jzzsfBQxcpC2ekcs//9JOiHnZ36DGAOVmbYHkwKxrY+4p'
        b'Qe7Z25TMg57AYu4gqm55Dx3pDYUwzx9eO86W3tOWiGOBMaX0A+OrtDzoTjiP46vK'
        b'WgFY3po2kkTPmQKwz1x6v3gIhsmH0yXuo1mqSRLlXhyztLnEDBTVjmBLLJGhC1/e'
        b'2odLIH5vXxaBEsyaG3yVU1VWcw14YPKRUfgKLvzmR83FKz1xnFtW+w0p0IQTmSx3'
        b'1nGziRGUEocbUOnC6xi5Vl/XMPIVkgkvJVCvcxVWnoDCtuDJlO2P2ovSad33QpZj'
        b'5unYYGS7MCssB5EyHhBiOlQ7xW0jxnJqEArbk9dhh6CX//9msPfXHHrJpVywnmOq'
        b'z+F++0nJruy3/HbSRPD/IupA5ySP36WXQlcJezyRlNbL9gM9HbDtViriRSAGH7T0'
        b'akHWfG+xwtYKO/hmcqnIY+bYIRJUxnITBupsdnLdxuZJnBqoRn4jEosY5rHWONK/'
        b'16+HQQ14JXmH/Sno+UaJpn2u2Itwdlh0Rz3F/wn6xJD8ALVxhz507TA8mdeO/2ch'
        b'MVl4+bqfRU8GemYK6HCKPt4L9UGyz/GqbDFsZWKkarf3Z8kqNbEPqXuvxwTaxsKy'
        b'zwMZDnN/NyZ59so6V0GFvSH9IcCphEA664QHMIqgfAeOAXJ9gCpuH94QqyttwPo7'
        b'ZtJ+3WXTIdwKoXEIHJJYZF3HhLdxFtn4ioW74XRuznNwN8+xeNuU32lO/pP5Iq9T'
        b'uQUzwC7ov6XGlcDh7afOwNxfHXZFtj3FL6R16MCHZR5hJGsxizKxkDPxd/KPJPt2'
        b'zR6triIDGt4w4jlw9kdgF4UMWrNYDRm8yLZ2Sm3rFXfNGJyla3P8Fzp5S+ybndpa'
        b'fzAKpmRxeiCTl8XgTsHSTBajDUeHSJW7IKn5ItO8OMkAeivKb/EC91JCxwFaUoSi'
        b'hVFiY0i1+jAAaaFLunx0Z9i6n7BoMY/YXYXfCjP/bABZSxAdavLBQ5F5ieO8m/uo'
        b'7Z0XQm6bjr5/+MgXXUBWvSw5m2Atc5Hv9pQ2NvJf+0/+rCjhFdZVd/9WFHCSfPJo'
        b'qLvOSQXu9+vrLr/uycC/BEF5AfWx6wN6O/0J3oKeAKBR5AEFKE2AyxDZIAA='
    ),
}
