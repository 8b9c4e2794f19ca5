"""Pure-Python/numpy image codec: real PNG decode/encode and JPEG
header parsing with zero third-party image libraries.

The container ships no pillow, but "multimodal decode" must still be
real — PNG is fully decodable with stdlib ``zlib`` plus numpy (chunk
walk → inflate → per-scanline unfilter), and JPEG dimensions/channels
are exactly recoverable from the SOF marker without a DCT pass. This
module is driver/executor-agnostic plain Python: the Spark plumbing
(Arrow batching, schema, partitioning) lives in ops/multimodal.py and
calls into these functions per payload.

Supported PNG subset (covers everything our encoder and common ML
corpora emit): bit depth 8, color types 0 (gray), 2 (RGB), 4
(gray+alpha), 6 (RGBA), no interlace, all five scanline filters.
Filters None/Sub/Up are numpy-vectorized per row (Sub via per-channel
cumsum); Average/Paeth fall back to a per-pixel loop — our encoder
never emits them, they exist so foreign PNGs decode correctly.

Reference capability analog: none — the reference (andreypopp/sqlpp)
has no multimodal support; this is the brief's net-new requirement.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
JPEG_SIGNATURE = b"\xff\xd8\xff"

_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class ImageCodecError(ValueError):
    """Malformed or unsupported image payload."""


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------


def png_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR without decompressing."""
    if data[:8] != PNG_SIGNATURE or len(data) < 33:
        raise ImageCodecError("not a PNG")
    if data[12:16] != b"IHDR":
        raise ImageCodecError("PNG missing IHDR")
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    if color_type not in _COLOR_TYPE_CHANNELS:
        raise ImageCodecError(f"unsupported PNG color type {color_type}")
    return w, h, _COLOR_TYPE_CHANNELS[color_type]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (h, w, channels).

    Real decode: walks the chunk stream, inflates concatenated IDATs,
    and reverses the per-scanline filter. Raises ImageCodecError on
    anything outside the supported subset (interlace, depth != 8,
    palette images).
    """
    if data[:8] != PNG_SIGNATURE:
        raise ImageCodecError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    h = depth = color_type = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ImageCodecError("truncated PNG chunk")
        if ctype == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if w is None or not idat:
        raise ImageCodecError("PNG missing IHDR/IDAT")
    if depth != 8:
        raise ImageCodecError(f"unsupported PNG bit depth {depth}")
    if interlace != 0:
        raise ImageCodecError("interlaced PNG not supported")
    if color_type not in _COLOR_TYPE_CHANNELS:
        raise ImageCodecError(f"unsupported PNG color type {color_type}")
    ch = _COLOR_TYPE_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    if raw.size != h * (stride + 1):
        raise ImageCodecError("PNG pixel data size mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        ft = filters[y]
        line = lines[y]
        prev = recon[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if ft == 0:  # None
            recon[y] = line
        elif ft == 1:  # Sub: cumulative sum per channel position
            recon[y] = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride)
        elif ft == 2:  # Up
            recon[y] = line + prev
        elif ft == 3:  # Average — left-dependency, per-pixel loop
            cur = recon[y]
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            continue
        elif ft == 4:  # Paeth — left-dependency, per-pixel loop
            cur = recon[y]
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (line[x] + pred) & 0xFF
            continue
        else:
            raise ImageCodecError(f"unknown PNG filter type {ft}")
        recon[y] &= 0xFF
    return recon.astype(np.uint8).reshape(h, w, ch)


# ---------------------------------------------------------------------------
# PNG encode
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array (h, w) or (h, w, ch∈{1,2,3,4}) → PNG bytes.

    ``filter_type`` ∈ {0 None, 1 Sub, 2 Up} applies one filter to every
    scanline — 1/2 exist mostly so tests can exercise the decoder's
    unfilter paths with genuinely foreign-shaped streams.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ImageCodecError(f"cannot encode array of shape {arr.shape}")
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch).astype(np.int32)
    if filter_type == 0:
        filtered = flat
    elif filter_type == 1:  # Sub
        left = np.zeros_like(flat)
        left[:, ch:] = flat[:, :-ch]
        filtered = (flat - left) & 0xFF
    elif filter_type == 2:  # Up
        up = np.zeros_like(flat)
        up[1:] = flat[:-1]
        filtered = (flat - up) & 0xFF
    else:
        raise ImageCodecError(f"unsupported encode filter {filter_type}")
    scan = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8),
         filtered.astype(np.uint8)],
        axis=1,
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), level)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# JPEG header parse (dimensions/channels without a DCT pass)
# ---------------------------------------------------------------------------

_SOF_MARKERS = {  # all Start-Of-Frame variants carry the same geometry
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def jpeg_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the first SOF marker."""
    if data[:3] != JPEG_SIGNATURE:
        raise ImageCodecError("not a JPEG")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1  # padding/garbage tolerance
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers, no length
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in _SOF_MARKERS:
            if pos + 9 > n:
                raise ImageCodecError("truncated JPEG SOF")
            _prec, h, w, ncomp = struct.unpack(
                ">BHHB", data[pos + 4 : pos + 10]
            )
            return w, h, ncomp
        if marker == 0xD9:  # EOI before any SOF
            break
        pos += 2 + seg_len
    raise ImageCodecError("JPEG SOF marker not found")


# ---------------------------------------------------------------------------
# Resize (nearest / bilinear) — real pixel resampling in numpy
# ---------------------------------------------------------------------------


def resize_array(
    arr: np.ndarray, target_w: int, target_h: int, method: str = "bilinear"
) -> np.ndarray:
    """(h, w, ch) uint8 → (target_h, target_w, ch) uint8.

    nearest: half-pixel-center index mapping (matches PIL NEAREST).
    bilinear: edge-clamped separable interpolation on float32.
    """
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, _ch = a.shape
    if method == "nearest":
        ys = np.minimum((np.arange(target_h) + 0.5) * h / target_h, h - 1).astype(np.int64)
        xs = np.minimum((np.arange(target_w) + 0.5) * w / target_w, w - 1).astype(np.int64)
        return a[ys[:, None], xs[None, :]]
    if method != "bilinear":
        raise ImageCodecError(f"unknown resize method {method!r}")
    fy = (np.arange(target_h) + 0.5) * h / target_h - 0.5
    fx = (np.arange(target_w) + 0.5) * w / target_w - 0.5
    y0 = np.clip(np.floor(fy), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(fx), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0).astype(np.float32)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0).astype(np.float32)[None, :, None]
    af = a.astype(np.float32)
    top = af[y0[:, None], x0[None, :]] * (1 - wx) + af[y0[:, None], x1[None, :]] * wx
    bot = af[y1[:, None], x0[None, :]] * (1 - wx) + af[y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
