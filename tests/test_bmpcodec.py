"""BMP codec (ops/bmpcodec.py): palettes, RLE8, row order, padding."""

from __future__ import annotations

import numpy as np
import pytest

from sqlpp_spark.ops.bmpcodec import (
    BmpCodecError,
    bmp_info,
    decode_bmp,
    encode_bmp,
)


def test_bmp_truecolor_roundtrips():
    rng = np.random.default_rng(9)
    for shape in ((7, 9, 3), (8, 8, 3), (5, 6, 4), (3, 1, 3), (1, 5, 4)):
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        for td in (False, True):
            d = encode_bmp(a, top_down=td)
            assert np.array_equal(decode_bmp(d), a), (shape, td)
            assert bmp_info(d) == (shape[1], shape[0], shape[2])


def test_bmp_palette_and_rle8_roundtrips():
    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    for shape in ((11, 13), (6, 20), (64, 64)):
        idx = rng.integers(0, 256, shape, dtype=np.uint8)
        for rle in (False, True):
            for td in (False, True):
                d = encode_bmp(idx, palette=pal, rle=rle, top_down=td)
                assert np.array_equal(decode_bmp(d), pal[idx]), (shape, rle, td)


def test_bmp_rle8_compresses_runs():
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    smooth = (np.mgrid[0:32, 0:64][0] * 4).astype(np.uint8)
    d = encode_bmp(smooth, palette=pal, rle=True)
    assert len(d) < 32 * 64
    assert np.array_equal(decode_bmp(d), pal[smooth])


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(BmpCodecError, match="not a BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)
    rng = np.random.default_rng(11)
    d = encode_bmp(rng.integers(0, 256, (9, 9, 3), dtype=np.uint8))
    with pytest.raises(BmpCodecError):
        decode_bmp(d[:40])
    with pytest.raises(BmpCodecError):
        decode_bmp(d[:-20])  # pixel data cut short
