"""EXIF metadata (JPEG APP1, TIFF-structured IFDs) — from scratch.

Real-world image pipelines prune and correct on EXIF before any pixel
work: orientation (tag 274) decides a rotate/flip, DateTime/
DateTimeOriginal gate freshness, pixel dimensions cross-check the
SOF geometry. This module implements the public EXIF 2.3 / TIFF 6.0
structure: the JPEG marker walk to the APP1 ``Exif\\0\\0`` segment,
the endian-aware IFD entry grammar (SHORT/LONG/ASCII/RATIONAL,
inline-vs-offset values), the ExifIFD sub-directory pointer
(tag 34665), plus a writer for synthesizing streams with closed-form
tag values (oracle-checkable) and ``apply_orientation`` for the
eight standard transforms.
"""

from __future__ import annotations

import struct

TAG_MAKE = 271
TAG_MODEL = 272
TAG_ORIENTATION = 274
TAG_DATETIME = 306
TAG_EXIF_IFD = 34665
TAG_DT_ORIGINAL = 36867
TAG_PIXEL_X = 40962
TAG_PIXEL_Y = 40963

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


class ExifError(ValueError):
    """Malformed EXIF payload."""


def _read_ifd(data: bytes, e: str, ifd_off: int) -> dict:
    if ifd_off + 2 > len(data):
        raise ExifError("IFD offset out of range")
    (count,) = struct.unpack_from(e + "H", data, ifd_off)
    if ifd_off + 2 + 12 * count > len(data):
        raise ExifError("IFD entry table overruns the segment")
    tags = {}
    for i in range(count):
        off = ifd_off + 2 + 12 * i
        tag, typ, n = struct.unpack_from(e + "HHI", data, off)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * n
        if total <= 4:
            raw = data[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack_from(e + "I", data, off + 8)
            if voff + total > len(data):
                raise ExifError("IFD value overruns the segment")
            raw = data[voff : voff + total]
        if typ == 3:
            tags[tag] = list(struct.unpack(e + f"{n}H", raw))
        elif typ == 4:
            tags[tag] = list(struct.unpack(e + f"{n}I", raw))
        elif typ == 2:
            tags[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 1:
            tags[tag] = list(raw)
        else:  # RATIONAL
            pairs = struct.unpack(e + f"{2 * n}I", raw)
            tags[tag] = [(pairs[2 * j], pairs[2 * j + 1]) for j in range(n)]
    return tags


def parse_exif_tiff(data: bytes) -> dict:
    """Parse a TIFF-structured EXIF blob (what sits after the APP1
    ``Exif\\0\\0`` prelude): IFD0 tags merged with the ExifIFD
    sub-directory's."""
    if data[:2] not in (b"II", b"MM") or len(data) < 8:
        raise ExifError("not a TIFF-structured EXIF blob")
    e = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic != 42:
        raise ExifError("bad TIFF magic")
    (ifd0,) = struct.unpack_from(e + "I", data, 4)
    tags = _read_ifd(data, e, ifd0)
    sub = tags.get(TAG_EXIF_IFD)
    if sub is not None:
        # the pointer must be a LONG/SHORT value — a wrongly-typed tag
        # (ASCII/RATIONAL) is malformed, not a TypeError crash
        if not (isinstance(sub, list) and sub
                and isinstance(sub[0], int)):
            raise ExifError("ExifIFD pointer has a non-integer type")
        tags.update(_read_ifd(data, e, sub[0]))
    return tags


def exif_from_jpeg(data: bytes) -> dict:
    """Walk the JPEG marker stream to the APP1 Exif segment and parse
    it. Raises ExifError when absent/malformed."""
    if data[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ExifError("bad JPEG marker alignment")
        # T.81 §B.1.1.2: any marker may be preceded by 0xFF fill
        # bytes — skip the run so the marker byte is the first
        # non-0xFF (previously fill degraded spec-valid files to
        # decoded=false via a bogus segment-length read)
        while pos + 4 <= n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # start of scan — no EXIF before it
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if seglen < 2 or pos + 2 + seglen > n:
            raise ExifError("JPEG segment overruns the stream")
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return parse_exif_tiff(data[pos + 10 : pos + 2 + seglen])
        pos += 2 + seglen
    raise ExifError("no Exif APP1 segment")


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def build_exif_tiff(
    orientation: int, make: str, datetime_str: str,
    pixel_x: int, pixel_y: int, dt_original: str | None = None,
) -> bytes:
    """Little-endian TIFF-structured EXIF blob: IFD0 (Make,
    Orientation, DateTime, ExifIFD pointer) + ExifIFD
    (DateTimeOriginal, PixelXDimension, PixelYDimension)."""

    def entry(tag, typ, n, value4):
        return struct.pack("<HHI", tag, typ, n) + value4

    # layout: header(8) | IFD0(2 + 4*12 + 4) | ExifIFD(2 + 3*12 + 4)
    # | overflow strings
    ifd0_off = 8
    ifd0_size = 2 + 4 * 12 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = 2 + 3 * 12 + 4
    str_off = exif_off + exif_size
    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime_str.encode("ascii") + b"\x00"
    dto_b = (dt_original or datetime_str).encode("ascii") + b"\x00"
    make_off = str_off
    dt_off = make_off + len(make_b)
    dto_off = dt_off + len(dt_b)

    def str_val(b: bytes, off: int) -> bytes:
        if len(b) <= 4:
            return b + b"\x00" * (4 - len(b))
        return struct.pack("<I", off)

    ifd0 = struct.pack("<H", 4)
    ifd0 += entry(TAG_MAKE, 2, len(make_b), str_val(make_b, make_off))
    ifd0 += entry(TAG_ORIENTATION, 3, 1, struct.pack("<HH", orientation, 0))
    ifd0 += entry(TAG_DATETIME, 2, len(dt_b), str_val(dt_b, dt_off))
    ifd0 += entry(TAG_EXIF_IFD, 4, 1, struct.pack("<I", exif_off))
    ifd0 += struct.pack("<I", 0)  # next-IFD pointer

    exif = struct.pack("<H", 3)
    exif += entry(TAG_DT_ORIGINAL, 2, len(dto_b), str_val(dto_b, dto_off))
    exif += entry(TAG_PIXEL_X, 4, 1, struct.pack("<I", pixel_x))
    exif += entry(TAG_PIXEL_Y, 4, 1, struct.pack("<I", pixel_y))
    exif += struct.pack("<I", 0)

    out = b"II" + struct.pack("<HI", 42, ifd0_off) + ifd0 + exif
    overflow = b""
    for b, off in ((make_b, make_off), (dt_b, dt_off), (dto_b, dto_off)):
        if len(b) > 4:
            overflow += b
        else:
            # inline value: the reserved offset space stays unused but
            # keeps the precomputed layout stable
            overflow += b"\x00" * len(b)
    return out + overflow


def insert_exif_app1(jpeg: bytes, exif_tiff: bytes) -> bytes:
    """Insert an APP1 Exif segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG")
    if len(exif_tiff) > 65525:  # 16-bit segment length minus overhead
        raise ExifError("EXIF blob exceeds the APP1 segment limit")
    payload = b"Exif\x00\x00" + exif_tiff
    seg = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    return jpeg[:2] + seg + jpeg[2:]


def apply_orientation(arr, orientation: int):
    """Apply an EXIF orientation (1..8) to an (h, w[, ch]) array —
    the correction step a training pipeline runs so pixels match the
    display orientation."""
    import numpy as np

    o = int(orientation)
    if o == 1:
        return arr
    if o == 2:
        return np.flip(arr, axis=1)
    if o == 3:
        return np.flip(np.flip(arr, axis=0), axis=1)
    if o == 4:
        return np.flip(arr, axis=0)
    if o == 5:
        return np.flip(np.rot90(arr, k=-1, axes=(0, 1)), axis=1)
    if o == 6:
        return np.rot90(arr, k=-1, axes=(0, 1))
    if o == 7:
        return np.flip(np.rot90(arr, k=1, axes=(0, 1)), axis=1)
    if o == 8:
        return np.rot90(arr, k=1, axes=(0, 1))
    raise ExifError(f"invalid EXIF orientation {o}")
