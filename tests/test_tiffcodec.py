"""TIFF codec (ops/tiffcodec.py): strip layouts, byte orders,
TIFF-LZW early change, PackBits, palettes."""

from __future__ import annotations

import numpy as np
import pytest

from sqlpp_spark.ops.tiffcodec import (
    TiffCodecError,
    _tlzw_decode,
    _tlzw_encode,
    decode_tiff,
    encode_tiff,
    tiff_info,
)


def test_tiff_roundtrip_matrix():
    rng = np.random.default_rng(12)
    for shape in ((7, 9), (8, 8, 3), (5, 6, 4), (33, 47, 3), (1, 1)):
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        exp = a if a.ndim == 3 else a[:, :, None]
        for comp in (1, 5, 32773):
            for bo in ("II", "MM"):
                for rps in (4, 16, 1000):
                    d = encode_tiff(
                        a, compression=comp, byte_order=bo, rows_per_strip=rps
                    )
                    assert np.array_equal(decode_tiff(d), exp), (shape, comp, bo, rps)
                    assert tiff_info(d) == (
                        exp.shape[1], exp.shape[0], exp.shape[2],
                    )


def test_tiff_lzw_early_change_boundaries():
    """The decoder's table lags the encoder's by one entry; the
    early-change rule must keep them in sync across EVERY code-width
    boundary (9→10→11→12) and through dictionary resets."""
    rng = np.random.default_rng(0)
    for n in (254, 255, 256, 511, 512, 1000, 5000, 20000):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _tlzw_decode(_tlzw_encode(d), n) == d, n


def test_tiff_palette():
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (11, 13), dtype=np.uint8)
    for comp in (1, 5, 32773):
        d = encode_tiff(idx, compression=comp, palette=pal)
        assert np.array_equal(decode_tiff(d), pal[idx]), comp
        assert tiff_info(d) == (13, 11, 3)


def test_tiff_compresses_smooth_content():
    smooth = (np.mgrid[0:64, 0:64][0] * 4).astype(np.uint8)
    for comp in (5, 32773):
        d = encode_tiff(smooth, compression=comp)
        assert len(d) < 64 * 64
        assert np.array_equal(decode_tiff(d)[:, :, 0], smooth)


def test_tiff_rejects_garbage_and_truncation():
    with pytest.raises(TiffCodecError, match="not a TIFF"):
        decode_tiff(b"XXXX" + b"\x00" * 40)
    rng = np.random.default_rng(14)
    d = encode_tiff(rng.integers(0, 256, (20, 20), dtype=np.uint8))
    with pytest.raises(TiffCodecError):
        decode_tiff(d[:50])
    with pytest.raises(TiffCodecError):
        decode_tiff(d[:-30])


def test_tiff_wrong_tag_type_raises_codec_error():
    """Round-8 review finding: a tag with an unexpected TYPE (e.g.
    ImageWidth stored as RATIONAL) must raise TiffCodecError, not a
    bare TypeError that escapes the malformed-payload contract."""
    import struct

    rng = np.random.default_rng(15)
    d = bytearray(encode_tiff(rng.integers(0, 256, (8, 8), dtype=np.uint8)))
    # IFD starts at offset 8: entries are (tag, type, count, value);
    # find the ImageWidth (256) entry and corrupt its type to RATIONAL
    n_ent = struct.unpack("<H", d[8:10])[0]
    for i in range(n_ent):
        off = 10 + 12 * i
        tag = struct.unpack("<H", d[off : off + 2])[0]
        if tag == 256:
            d[off + 2 : off + 4] = struct.pack("<H", 5)  # RATIONAL
            break
    with pytest.raises(TiffCodecError):
        decode_tiff(bytes(d))
