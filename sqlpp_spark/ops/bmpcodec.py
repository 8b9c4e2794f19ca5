"""BMP (Windows DIB) codec in pure numpy — BITMAPINFOHEADER with
8-bit palette (BI_RGB and BI_RLE8), 24-bit BGR and 32-bit BGRA,
bottom-up and top-down row order, 4-byte row padding.

Fourth legacy image format on the multimodal decode surface (after
PNG/JPEG/GIF). BMP is trivial structurally but its quirks — BGR byte
order, bottom-up rows, word-aligned RLE absolute runs, palette stored
as BGRX quads — are exactly what foreign payloads get wrong, so the
decoder validates sizes and raises BmpCodecError rather than
misreading."""

from __future__ import annotations

import struct

import numpy as np


class BmpCodecError(ValueError):
    pass


BMP_SIGNATURE = b"BM"


def bmp_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the headers."""
    if data[:2] != BMP_SIGNATURE or len(data) < 54:
        raise BmpCodecError("not a BMP")
    w, h = struct.unpack("<ii", data[18:26])
    bits = struct.unpack("<H", data[28:30])[0]
    ch = {8: 3, 24: 3, 32: 4}.get(bits)
    if ch is None:
        raise BmpCodecError(f"unsupported BMP bit count {bits}")
    return w, abs(h), ch


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 (h, w, 3|4) RGB(A)."""
    try:
        return _decode_inner(data)
    except BmpCodecError:
        raise
    except (IndexError, ValueError, struct.error) as e:
        raise BmpCodecError(f"malformed BMP stream: {e}") from None


def _decode_inner(data: bytes) -> np.ndarray:
    if data[:2] != BMP_SIGNATURE:
        raise BmpCodecError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpCodecError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack("<ii", data[18:26])
    bits, comp = struct.unpack("<HI", data[28:34])
    (n_colors,) = struct.unpack("<I", data[46:50])
    if w <= 0 or h_raw == 0:
        raise BmpCodecError("invalid BMP dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bits == 8:
        n = n_colors or 256
        pal_off = 14 + hdr_size
        quads = np.frombuffer(
            data[pal_off : pal_off + 4 * n], dtype=np.uint8
        ).reshape(n, 4)
        palette = quads[:, 2::-1]  # BGRX → RGB
        if comp == 0:  # BI_RGB
            stride = (w + 3) & ~3
            raw = np.frombuffer(
                data[pix_off : pix_off + stride * h], dtype=np.uint8
            )
            if raw.size != stride * h:
                raise BmpCodecError("BMP pixel data size mismatch")
            idx = raw.reshape(h, stride)[:, :w]
        elif comp == 1:  # BI_RLE8
            idx = _decode_rle8(data[pix_off:], w, h)
        else:
            raise BmpCodecError(f"unsupported 8-bit compression {comp}")
        if int(idx.max(initial=0)) >= n:
            raise BmpCodecError("BMP palette index out of range")
        out = palette[idx.astype(np.int64)]
    elif bits in (24, 32):
        if comp != 0:
            raise BmpCodecError(f"unsupported {bits}-bit compression {comp}")
        bpp = bits // 8
        stride = (w * bpp + 3) & ~3
        raw = np.frombuffer(
            data[pix_off : pix_off + stride * h], dtype=np.uint8
        )
        if raw.size != stride * h:
            raise BmpCodecError("BMP pixel data size mismatch")
        rows = raw.reshape(h, stride)[:, : w * bpp].reshape(h, w, bpp)
        if bits == 24:
            out = rows[:, :, ::-1]  # BGR → RGB
        else:
            out = rows[:, :, [2, 1, 0, 3]]  # BGRA → RGBA
    else:
        raise BmpCodecError(f"unsupported BMP bit count {bits}")
    return np.ascontiguousarray(out if top_down else out[::-1])


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n:  # encoded run
            if x + n > w:
                raise BmpCodecError("RLE8 run past row end")
            out[y, x : x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute run, word-aligned
            if x + v > w:
                raise BmpCodecError("RLE8 absolute run past row end")
            out[y, x : x + v] = np.frombuffer(
                data[pos : pos + v], dtype=np.uint8
            )
            pos += v + (v & 1)
            x += v
        if y >= h and not (y == h and x == 0):
            raise BmpCodecError("RLE8 data past image end")
    raise BmpCodecError("RLE8 stream missing end-of-bitmap")


def _rle8_encode(idx: np.ndarray) -> bytes:
    out = bytearray()
    h, w = idx.shape
    for y in range(h):
        row = idx[y]
        x = 0
        while x < w:
            v = row[x]
            n = 1
            while x + n < w and n < 255 and row[x + n] == v:
                n += 1
            out += bytes([n, int(v)])
            x += n
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def encode_bmp(
    arr: np.ndarray, palette: "np.ndarray | None" = None,
    rle: bool = False, top_down: bool = False,
) -> bytes:
    """RGB(A) (h, w, 3|4) uint8 → 24/32-bit BMP; or (h, w) palette
    indices + a (n, 3) RGB ``palette`` → 8-bit BMP (BI_RLE8 when
    ``rle``)."""
    a = np.asarray(arr, dtype=np.uint8)
    if palette is not None:
        if a.ndim != 2:
            raise BmpCodecError("palette BMP expects (h, w) indices")
        h, w = a.shape
        pal = np.asarray(palette, dtype=np.uint8)
        n = len(pal)
        quads = np.zeros((n, 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB → BGRX
        rows = a if top_down else a[::-1]
        if rle:
            pix = _rle8_encode(rows)
            comp = 1
        else:
            stride = (w + 3) & ~3
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, :w] = rows
            pix = padded.tobytes()
            comp = 0
        bits = 8
        pal_bytes = quads.tobytes()
    else:
        if a.ndim != 3 or a.shape[2] not in (3, 4):
            raise BmpCodecError("expected (h, w, 3|4) RGB(A)")
        h, w, ch = a.shape
        rows = a if top_down else a[::-1]
        if ch == 3:
            bgr = rows[:, :, ::-1]
            stride = (w * 3 + 3) & ~3
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, : w * 3] = bgr.reshape(h, w * 3)
            pix = padded.tobytes()
            bits = 24
        else:
            bgra = rows[:, :, [2, 1, 0, 3]]
            pix = bgra.tobytes()
            bits = 32
        comp = 0
        pal_bytes = b""
        n = 0
    pix_off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bits, comp,
        len(pix), 2835, 2835, n, 0,
    )
    head = b"BM" + struct.pack("<IHHI", pix_off + len(pix), 0, 0, pix_off)
    return head + info + pal_bytes + pix
