"""Baseline TIFF codec in pure numpy — both byte orders (II/MM),
strip organization, uncompressed / PackBits / TIFF-LZW compression,
grayscale / RGB(A) / palette photometrics.

Fifth image format on the multimodal decode surface. TIFF's LZW is
NOT GIF's (ops/gifcodec.py): codes pack MSB-first, the minimum code
size is fixed at 8 (256 = ClearCode, 257 = EOI), and the code width
increments ONE CODE EARLY ("early change", TIFF6 spec section 13).
PackBits is the classic Apple RLE. Palette ColorMaps store 16-bit
channel values (high byte = 8-bit color).

Strips decode independently — at corpus scale each payload decodes in
one mapInPandas task like the other codecs; within a payload, strip
decompression is sequential per strip but strips are small by
construction (RowsPerStrip)."""

from __future__ import annotations

import struct

import numpy as np


class TiffCodecError(ValueError):
    pass


TIFF_SIGNATURES = (b"II*\x00", b"MM\x00*")

_CLEAR, _EOI = 256, 257


# ---------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, early change)
# ---------------------------------------------------------------------------


def _tlzw_decode(data: bytes, expected: int) -> bytes:
    table: list[bytes] = []
    width = 9

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == _CLEAR:
                reset()
                prev = None
                continue
            if code == _EOI:
                if len(out) < expected:
                    raise TiffCodecError("LZW strip ended short of row data")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise TiffCodecError("LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffCodecError("LZW code out of range")
            out += entry
            prev = entry
            # Early change (TIFF6 §13): the decoder widens as soon as
            # its table holds 2^width - 1 entries — one entry earlier
            # than plain LZW because its table lags the encoder's by
            # one. Threshold determined EMPIRICALLY against libtiff
            # streams (tests/test_tiff_interop.py): -2 here desyncs
            # exactly at the 9→10 boundary yet self-round-trips if the
            # encoder carries the mirrored error, which is how the bug
            # this replaces survived until the interop tests existed.
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise TiffCodecError("LZW strip truncated")
    return bytes(out[:expected])


def _tlzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict = {}
    next_code = _EOI + 1
    width = 9
    emit(_CLEAR, width)
    prev = -1
    for b in data:
        if prev < 0:
            prev = b
            continue
        code = table.get((prev, b))
        if code is not None:
            prev = code
            continue
        emit(prev, width)
        table[(prev, b)] = next_code
        next_code += 1
        # Mirror of the decoder's early change: the encoder starts
        # emitting (width+1)-bit codes once code 2^width - 1 has been
        # ASSIGNED (next_code reaches 2^width) — verified against
        # libtiff's decoder in tests/test_tiff_interop.py.
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(_CLEAR, width)
            table.clear()
            next_code = _EOI + 1
            width = 9
        prev = b
    if prev >= 0:
        emit(prev, width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal n+1 bytes
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    if len(out) < expected:
        raise TiffCodecError("PackBits strip truncated")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, e: str):
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    (count,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(count):
        off = ifd_off + 2 + 12 * i
        tag, typ, n = struct.unpack(e + "HHI", data[off : off + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * n
        if total <= 4:
            raw = data[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack(e + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + total]
        if typ == 3:
            vals = list(struct.unpack(e + f"{n}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(e + f"{n}I", raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = [raw]
        tags[tag] = vals
    return tags


def tiff_info(data: bytes) -> tuple[int, int, int]:
    if data[:4] not in TIFF_SIGNATURES:
        raise TiffCodecError("not a TIFF")
    e = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, e)
    w, h = tags[256][0], tags[257][0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    return w, h, 3 if photo == 3 else spp


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → uint8 (h, w, ch). Baseline: 8-bit samples,
    photometric 0/1 (gray, 0 = inverted), 2 (RGB/RGBA), 3 (palette);
    compression 1 (none), 5 (TIFF-LZW), 32773 (PackBits); any strip
    layout; II and MM byte orders."""
    try:
        return _decode_inner(data)
    except TiffCodecError:
        raise
    except (IndexError, ValueError, TypeError, struct.error, KeyError) as ex:
        raise TiffCodecError(f"malformed TIFF: {ex!r}") from None


def _decode_inner(data: bytes) -> np.ndarray:
    if data[:4] not in TIFF_SIGNATURES:
        raise TiffCodecError("not a TIFF")
    e = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, e)
    w, h = tags[256][0], tags[257][0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    if any(b != 8 for b in bps):
        raise TiffCodecError(f"unsupported TIFF bits per sample {bps}")
    if photo not in (0, 1, 2, 3):
        raise TiffCodecError(f"unsupported TIFF photometric {photo}")
    if photo == 3 and spp != 1:
        raise TiffCodecError("palette TIFF must have 1 sample per pixel")
    offsets = tags[273]
    counts = tags[279]
    rps = tags.get(278, [h])[0] or h
    row_bytes = w * spp
    out = bytearray()
    row = 0
    for soff, scnt in zip(offsets, counts):
        nrows = min(rps, h - row)
        expected = nrows * row_bytes
        strip = data[soff : soff + scnt]
        if len(strip) != scnt:
            raise TiffCodecError("TIFF strip out of bounds")
        if comp == 1:
            if len(strip) < expected:
                raise TiffCodecError("TIFF strip truncated")
            out += strip[:expected]
        elif comp == 5:
            out += _tlzw_decode(strip, expected)
        elif comp == 32773:
            out += _packbits_decode(strip, expected)
        else:
            raise TiffCodecError(f"unsupported TIFF compression {comp}")
        row += nrows
    if row < h:
        raise TiffCodecError("TIFF strips cover fewer rows than ImageLength")
    arr = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, spp)
    predictor = tags.get(317, [1])[0]
    if predictor == 2:
        # Horizontal differencing (TIFF6 §14): each sample stores the
        # delta to the same sample one pixel left; invert with a
        # wrapping cumulative sum along the row.
        arr = np.cumsum(arr, axis=1, dtype=np.uint32).astype(np.uint8)
    elif predictor != 1:
        raise TiffCodecError(f"unsupported TIFF predictor {predictor}")
    if photo == 0:  # WhiteIsZero
        arr = 255 - arr
    if photo == 3:
        cmap = tags.get(320)
        if cmap is None:
            raise TiffCodecError("palette TIFF missing ColorMap")
        vals = cmap[0] if isinstance(cmap[0], (bytes, bytearray)) else cmap
        n = len(vals) // 3
        cm = (np.array(vals, dtype=np.uint32).reshape(3, n).T >> 8).astype(
            np.uint8
        )
        idx = arr[:, :, 0].astype(np.int64)
        if int(idx.max(initial=0)) >= n:
            raise TiffCodecError("TIFF palette index out of range")
        return np.ascontiguousarray(cm[idx])
    return np.ascontiguousarray(arr)


def encode_tiff(
    arr: np.ndarray, compression: int = 1, byte_order: str = "II",
    rows_per_strip: int = 16, palette: "np.ndarray | None" = None,
) -> bytes:
    """(h, w[, ch]) uint8 → baseline TIFF. ``compression`` ∈ {1, 5,
    32773}; with ``palette`` (n, 3) the input is (h, w) indices and a
    photometric-3 file is written."""
    if byte_order not in ("II", "MM"):
        raise TiffCodecError("byte_order must be II or MM")
    e = "<" if byte_order == "II" else ">"
    a = np.asarray(arr, dtype=np.uint8)
    if palette is not None:
        if a.ndim != 2:
            raise TiffCodecError("palette TIFF expects (h, w) indices")
        a = a[:, :, None]
        photo, spp = 3, 1
    else:
        if a.ndim == 2:
            a = a[:, :, None]
        if a.shape[2] not in (1, 3, 4):
            raise TiffCodecError("expected 1/3/4 channels")
        photo = 1 if a.shape[2] == 1 else 2
        spp = a.shape[2]
    h, w, _ = a.shape
    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = a[r0 : r0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_tlzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise TiffCodecError(f"unsupported compression {compression}")

    entries = []  # (tag, type, count, values)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [photo]))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 3, 1, [min(rows_per_strip, h)]))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    cmap_vals = None
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        n = len(pal)
        cmap_vals = (
            pal.T.astype(np.uint16) * 257  # 8 → 16 bit (v | v<<8)
        ).reshape(-1).tolist()
        entries.append((320, 3, 3 * n, cmap_vals))
    entries.append((273, 4, len(strips), None))  # patched below

    # layout: header(8) | IFD | overflow values | strips
    entries.sort(key=lambda t: t[0])
    n_ent = len(entries)
    ifd_off = 8
    ifd_size = 2 + 12 * n_ent + 4
    overflow = bytearray()
    over_base = ifd_off + ifd_size

    def pack_vals(typ, vals):
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        return struct.pack(e + f"{len(vals)}{fmt}", *vals)

    # first pass: compute overflow for everything except strip offsets
    packed = {}
    for tag, typ, cnt, vals in entries:
        if vals is None:
            continue
        body = pack_vals(typ, vals)
        if len(body) > 4:
            packed[tag] = ("off", len(overflow))
            overflow += body
        else:
            packed[tag] = ("inline", body)
    # strip offsets: place strips after overflow (+ room for the strip
    # offset array itself when it overflows)
    so_body_len = 4 * len(strips)
    so_overflow = so_body_len > 4
    strips_base = over_base + len(overflow) + (so_body_len if so_overflow else 0)
    offs = []
    cur = strips_base
    for s2 in strips:
        offs.append(cur)
        cur += len(s2)
    so_body = pack_vals(4, offs)
    out = bytearray()
    out += (b"II*\x00" if e == "<" else b"MM\x00*")
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n_ent)
    for tag, typ, cnt, vals in entries:
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if tag == 273:
            if so_overflow:
                out += struct.pack(e + "I", over_base + len(overflow))
            else:
                out += so_body.ljust(4, b"\x00")
            continue
        kind, v = packed[tag]
        if kind == "off":
            out += struct.pack(e + "I", over_base + v)
        else:
            out += v.ljust(4, b"\x00")
    out += struct.pack(e + "I", 0)  # next IFD
    out += overflow
    if so_overflow:
        out += so_body
    for s2 in strips:
        out += s2
    return bytes(out)
