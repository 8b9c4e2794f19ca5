"""Regenerate sqlpp_spark/ops/vp8tables.py from the system libwebp.

The VP8 coefficient/mode probability and dequantization tables are
published constants of the VP8 specification (RFC 6386 §11.2, §13.4,
§13.5, §14.1). This container ships no copy of the RFC text, so the
canonical byte values are recovered from the ONE public VP8
implementation present — `libwebp.so.7` — by structural scanning of
its read-only data (the tables are spec constants, identical in every
conforming implementation: libwebp, libvpx, ffmpeg, the RFC's own
dixie decoder). Each table is located by shape + value invariants and
anchored with known spec values, NOT by hardcoded file offsets, so the
script survives library rebuilds:

- AC dequant lookup: the unique strictly-increasing uint16[128] run
  starting at 4 and ending 284.
- DC dequant lookup: the unique non-decreasing uint8[128] run starting
  at 4 and ending 157.
- Coefficient-update probabilities (uint8[4][8][3][11]): the unique
  zero-free 1056-byte run dominated by 255s (>85%).
- Keyframe B-mode probabilities (uint8[10][10][9]): the 900-byte run
  beginning with the published first row 231,120,48,89,115,113,...
- Default coefficient probabilities (uint8[4][8][3][11]): the
  1056-byte run whose first 33 bytes are 128 (block-type-0 band 0 is
  never coded) followed by the published 253,136,254 triple.

Every extracted value is then proven in use: tests/test_vp8_interop.py
decodes libwebp-ENCODED lossy streams and requires bit-exact YUV
agreement with libwebp's own reconstruction — a single wrong table
byte fails those tests.

Usage: python tools/extract_vp8_tables.py  (rewrites vp8tables.py)
"""

from __future__ import annotations

import struct
import sys

LIB_CANDIDATES = [
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5",
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
]


def _find_ac(data: bytes) -> tuple[int, tuple[int, ...]]:
    for off in range(0, len(data) - 256, 2):
        u = struct.unpack_from("<128H", data, off)
        if (u[0] == 4 and u[-1] == 284
                and all(u[i] < u[i + 1] for i in range(127))):
            return off, u
    raise SystemExit("AC dequant table not found")


def _find_dc(data: bytes) -> tuple[int, bytes]:
    for off in range(len(data) - 128):
        u = data[off:off + 128]
        if (u[0] == 4 and u[-1] == 157
                and all(u[i] <= u[i + 1] for i in range(127))):
            return off, u
    raise SystemExit("DC dequant table not found")


def _find_update(data: bytes) -> tuple[int, bytes]:
    off = 0
    while off < len(data) - 1056:
        u = data[off:off + 1056]
        if u.count(255) > 1056 * 0.85 and 0 not in u:
            return off, u
        off += 1
    raise SystemExit("coefficient update-probability table not found")


# libwebp numbers the 4x4 modes B_RD=4, B_VR=5, B_LD=6, B_VL=7 while
# RFC 6386 §11.2 numbers them B_LD=4, B_RD=5, B_VR=6, B_VL=7 (the
# other six coincide). The binary's kBModesProba[above][left] rows and
# columns are therefore permuted relative to the RFC's kf_bmode_prob;
# re-order into RFC numbering so the decoder can index with the same
# mode codes it dispatches prediction on. (Diagnosed empirically: with
# the raw table, decode diverged at exactly the first sub-block whose
# above/left context involved a mode in {LD, RD, VR}.)
_RFC_TO_LIBWEBP = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)


def _find_bmode(data: bytes) -> tuple[int, bytes]:
    anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    off = data.find(anchor)
    if off < 0:
        raise SystemExit("kf b-mode probability table not found")
    u = data[off:off + 900]
    if 0 in u:
        raise SystemExit("kf b-mode table contains zero byte")
    perm = bytearray(900)
    for a in range(10):
        for l_ in range(10):
            src = (_RFC_TO_LIBWEBP[a] * 10 + _RFC_TO_LIBWEBP[l_]) * 9
            perm[(a * 10 + l_) * 9:(a * 10 + l_) * 9 + 9] = \
                u[src:src + 9]
    return off, bytes(perm)


def _find_coeffs0(data: bytes) -> tuple[int, bytes]:
    anchor = bytes([128] * 33) + bytes([253, 136, 254])
    off = data.find(anchor)
    if off < 0:
        raise SystemExit("default coefficient probability table not found")
    u = data[off:off + 1056]
    if 0 in u:
        raise SystemExit("default coefficient table contains zero byte")
    return off, u


def _fmt(name: str, values, per_line: int = 12) -> str:
    lines = [f"{name} = ("]
    row: list[str] = []
    for v in values:
        row.append(str(v))
        if len(row) == per_line:
            lines.append("    " + ", ".join(row) + ",")
            row = []
    if row:
        lines.append("    " + ", ".join(row) + ",")
    lines.append(")")
    return "\n".join(lines)


def main() -> None:
    path = None
    for cand in LIB_CANDIDATES:
        try:
            with open(cand, "rb") as f:
                data = f.read()
            path = cand
            break
        except OSError:
            continue
    if path is None:
        raise SystemExit("system libwebp not found")

    ac_off, ac = _find_ac(data)
    dc_off, dc = _find_dc(data)
    up_off, up = _find_update(data)
    bm_off, bm = _find_bmode(data)
    c0_off, c0 = _find_coeffs0(data)

    out = f'''"""VP8 specification constant tables (RFC 6386).

GENERATED by tools/extract_vp8_tables.py from the system libwebp
({path}) — see that script's docstring for the
structural-scan provenance. These are the published spec constants
(RFC 6386 §11.2 kf b-mode probabilities, §13.4 coefficient update
probabilities, §13.5 default coefficient probabilities, §14.1
dequantization lookups), identical in every conforming VP8
implementation; they are data, not code. Do not edit by hand.

Shapes:
- AC_QLOOKUP / DC_QLOOKUP: [128] dequantization factors.
- COEFF_UPDATE_PROBS / COEFF_DEFAULT_PROBS: flat [4*8*3*11] indexed
  [block_type][coeff_band][context][tree_node].
- KF_BMODE_PROBS: flat [10*10*9] indexed [above_mode][left_mode][node].
"""

{_fmt("AC_QLOOKUP", ac)}

{_fmt("DC_QLOOKUP", dc)}

{_fmt("COEFF_UPDATE_PROBS", up)}

{_fmt("COEFF_DEFAULT_PROBS", c0)}

{_fmt("KF_BMODE_PROBS", bm)}
'''
    dest = "sqlpp_spark/ops/vp8tables.py"
    with open(dest, "w") as f:
        f.write(out)
    print(f"wrote {dest}: ac@{ac_off:#x} dc@{dc_off:#x} update@{up_off:#x} "
          f"bmode@{bm_off:#x} coeffs0@{c0_off:#x} of {path}")


if __name__ == "__main__":
    sys.exit(main())
