"""GIF87a/89a codec in pure numpy/python — LZW decode + encode,
global/local color tables, row interlacing, GCE transparency.

Extends the multimodal decode surface to the third big crawl-corpus
image format (after PNG and JPEG, ops/imagecodec.py). Spec: W3C/
CompuServe GIF89a. Static images (first frame); animation frames
beyond the first are ignored by ``decode_gif`` (documented: a frame
iterator is a composition away, the container walk already parses
every block).

LZW here is the GIF variant: variable code width starting at
min_code_size+1, CLEAR and EOI codes, dictionary grows to 4096 then
the encoder emits CLEAR and resets. The decoder is a straight table
of byte strings; the encoder keeps a dict keyed by (prefix_code,
next_byte). Both are per-image Python loops — interpreter-bound but
embarrassingly parallel across payloads in the mapInPandas batch
path, same story as the JPEG entropy loop.
"""

from __future__ import annotations

import struct

import numpy as np


class GifCodecError(ValueError):
    pass


GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits  # GIF packs codes LSB-first
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return np.frombuffer(bytes(out), dtype=np.uint8)[:expected]
            if prev is None:
                if code >= len(table):
                    raise GifCodecError("LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:  # deferred-clear streams freeze
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise GifCodecError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return np.frombuffer(bytes(out), dtype=np.uint8)[:expected]
    if len(out) < expected:
        raise GifCodecError("LZW stream truncated")
    return np.frombuffer(bytes(out), dtype=np.uint8)[:expected]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = -1
    for b in indices.astype(np.int64):
        b = int(b)
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = b
    if prev >= 0:
        emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def gif_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the header without LZW decode
    (channels: 4 when the first frame's GCE sets transparency)."""
    if data[:6] not in GIF_SIGNATURES:
        raise GifCodecError("not a GIF")
    try:
        w, h = struct.unpack("<HH", data[6:10])
        return w, h, 4 if _first_gce_transparent(data) else 3
    except GifCodecError:
        raise
    except (IndexError, struct.error) as e:
        raise GifCodecError(f"truncated GIF header: {e}") from None


def _first_gce_transparent(data: bytes) -> bool:
    pos = 10
    packed = data[pos]
    pos += 3
    if packed & 0x80:
        pos += 3 * (2 << (packed & 7))
    while pos < len(data):
        b = data[pos]
        if b == 0x21 and pos + 1 < len(data) and data[pos + 1] == 0xF9:
            return bool(data[pos + 3] & 1)
        if b in (0x2C, 0x3B):
            return False
        if b == 0x21:  # other extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        raise GifCodecError(f"unexpected GIF block 0x{b:02X}")
    return False


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 (h, w, 3) — or (h, w, 4) when the first
    frame's graphic control extension declares a transparent index.
    First frame only; interlaced row order handled."""
    try:
        for frame in _iter_gif_frames(data):
            return frame
        raise GifCodecError("GIF contains no image data")
    except GifCodecError:
        raise
    except (IndexError, ValueError, struct.error) as e:  # malformed container
        raise GifCodecError(f"malformed GIF stream: {e}") from None


def decode_gif_frames(data: bytes, max_frames: int | None = None) -> list:
    """ALL frames of an animated GIF as uint8 arrays — sub-screen
    frames composite over the previous frame at their (left, top)
    offset (disposal methods 0/1; the restore-to-background and
    restore-to-previous methods are approximated the same way, the
    common treatment for frame *sampling*). This is the real decode
    behind the video-modality frame extractor."""
    try:
        frames = []
        for frame in _iter_gif_frames(data):
            frames.append(frame)
            if max_frames is not None and len(frames) >= max_frames:
                break
        if not frames:
            raise GifCodecError("GIF contains no image data")
        return frames
    except GifCodecError:
        raise
    except (IndexError, ValueError, struct.error) as e:
        raise GifCodecError(f"malformed GIF stream: {e}") from None


def _iter_gif_frames(data: bytes):
    if data[:6] not in GIF_SIGNATURES:
        raise GifCodecError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed, bg, _ar = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = None
    canvas = None
    first = True
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:
                flags = data[pos + 1]
                transparent = data[pos + 4] if flags & 1 else None
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise GifCodecError(f"unexpected GIF block 0x{b:02X}")
        # image descriptor
        ix, iy, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            lct = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        interlaced = bool(ipacked & 0x40)
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            sz = data[pos]
            lzw += data[pos + 1 : pos + 1 + sz]
            pos += 1 + sz
        pos += 1
        table = lct if lct is not None else gct
        if table is None:
            raise GifCodecError("GIF image with no color table")
        idx = _lzw_decode(bytes(lzw), min_code, iw * ih).astype(np.int64)
        if idx.size != iw * ih:
            raise GifCodecError("GIF pixel data size mismatch")
        if int(idx.max(initial=0)) >= len(table):
            raise GifCodecError("GIF color index out of range")
        idx = idx.reshape(ih, iw)
        if interlaced:
            de = np.empty_like(idx)
            row = 0
            for start, step in _INTERLACE_PASSES:
                nrows = len(range(start, ih, step))
                de[start::step] = idx[row : row + nrows]
                row += nrows
            idx = de
        rgb = table[idx]
        ch = 4 if transparent is not None else 3
        if canvas is None:
            canvas = np.zeros((sh, sw, ch), dtype=np.uint8)
            if gct is not None and transparent is None:
                canvas[:, :, :3] = gct[min(bg, len(gct) - 1)]
            if ch == 4:
                canvas[:, :, 3] = 255
        elif canvas.shape[2] != ch:  # GCE transparency changed mid-file
            if ch == 4:
                canvas = np.concatenate(
                    [canvas, np.full((sh, sw, 1), 255, dtype=np.uint8)],
                    axis=-1,
                )
            else:
                ch = 4  # keep RGBA once established
        if ix + iw > sw or iy + ih > sh:
            raise GifCodecError("GIF frame exceeds screen bounds")
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent is not None:
            opaque = idx != transparent
            if first:
                # first-frame contract (matches PNG tRNS): every pixel
                # carries its palette RGB, transparent ones alpha 0
                region[:, :, :3] = rgb
                region[:, :, 3] = np.where(opaque, 255, 0)
            else:
                # later frames: transparency shows the prior frame
                region[:, :, :3][opaque] = rgb[opaque]
                if canvas.shape[2] == 4:
                    region[:, :, 3][opaque] = 255
        else:
            region[:, :, :3] = rgb
            if canvas.shape[2] == 4:
                # an opaque frame painted over previously transparent
                # pixels makes them opaque again
                region[:, :, 3] = 255
        first = False
        # GIF89a: a Graphic Control Extension's scope is exactly the one
        # rendering block that follows it — a later frame without its own
        # GCE must not inherit this frame's transparent index.
        transparent = None
        yield canvas.copy()


def encode_gif_animated(
    frames, interlace: bool = False, delay_cs: int = 10,
) -> bytes:
    """List of uint8 (h, w, 3) RGB frames (shared ≤256-color palette
    across ALL frames) → animated GIF89a with per-frame GCE delays."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise GifCodecError("no frames")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise GifCodecError("all frames must share (h, w, 3)")
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inv = np.unique(stacked, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifCodecError(f"{len(colors)} colors exceed GIF's 256")
    depth = max(1, int(len(colors) - 1).bit_length())
    n = 1 << depth
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += pal.tobytes()
    # Netscape loop extension (standard for animations)
    out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
    out += bytes([3, 1, 0, 0, 0])
    min_code = max(2, depth)
    per = h * w
    for i in range(len(frames)):
        idx = inv[i * per : (i + 1) * per].reshape(h, w)
        out += bytes([0x21, 0xF9, 4, 0x00]) + struct.pack("<H", delay_cs)
        out += bytes([0, 0])
        rows = idx
        if interlace:
            rows = np.concatenate(
                [idx[s0::st] for s0, st in _INTERLACE_PASSES], axis=0
            )
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00, min_code])
        lzw = _lzw_encode(rows.reshape(-1).astype(np.uint8), min_code)
        for off in range(0, len(lzw), 255):
            block = lzw[off : off + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def encode_gif(
    rgb: np.ndarray, interlace: bool = False,
    transparent: "int | None" = None, loop_frames: int = 1,
) -> bytes:
    """uint8 (h, w, 3) RGB (≤256 unique colors) → GIF89a bytes.
    ``transparent`` marks that palette index in a GCE. ``loop_frames``
    repeats the frame to exercise the multi-frame container walk."""
    a = np.asarray(rgb, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise GifCodecError("expected (h, w, 3) RGB")
    h, w, _ = a.shape
    colors, idx = np.unique(a.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifCodecError(f"{len(colors)} colors exceed GIF's 256")
    idx = idx.reshape(h, w)
    depth = max(1, int(len(colors) - 1).bit_length())
    n = 1 << depth
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += pal.tobytes()
    min_code = max(2, depth)
    for _f in range(max(1, loop_frames)):
        if transparent is not None:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        rows = idx
        if interlace:
            parts = [idx[start::step] for start, step in _INTERLACE_PASSES]
            rows = np.concatenate(parts, axis=0)
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00, min_code])
        lzw = _lzw_encode(rows.reshape(-1), min_code)
        for off in range(0, len(lzw), 255):
            block = lzw[off : off + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
