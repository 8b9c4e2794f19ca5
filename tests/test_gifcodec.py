"""GIF codec (ops/gifcodec.py): LZW, palettes, interlacing,
transparency, multi-frame container walk."""

from __future__ import annotations

import numpy as np
import pytest

from sqlpp_spark.ops.gifcodec import (
    GifCodecError,
    decode_gif,
    encode_gif,
    gif_info,
)


def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    for shape in ((7, 9), (33, 47), (1, 1), (64, 64)):
        img = pal[rng.integers(0, 256, shape)]
        for il in (False, True):
            d = encode_gif(img, interlace=il)
            assert np.array_equal(decode_gif(d), img), (shape, il)
            assert gif_info(d) == (shape[1], shape[0], 3)


def test_gif_small_palette_depth():
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_transparency_yields_rgba():
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    d = encode_gif(img, transparent=0)
    out = decode_gif(d)
    assert out.shape[2] == 4
    assert gif_info(d)[2] == 4
    assert np.array_equal(out[:, :, :3], img)
    # exactly the pixels carrying palette index 0 are transparent
    assert (out[:, :, 3] == 0).sum() >= 1


def test_gif_multiframe_first_frame_decoded():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 64, (12, 18))]
    assert np.array_equal(decode_gif(encode_gif(img, loop_frames=4)), img)


def test_gif_lzw_dictionary_reset():
    """A big noisy image forces > 4096 LZW codes — the encoder must
    emit CLEAR + reset and the decoder must follow."""
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 256, (128, 128))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_compresses_smooth_content():
    yy, xx = np.mgrid[0:64, 0:64]
    gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    img = gray[((xx + yy) // 8) % 256]
    d = encode_gif(img)
    assert len(d) < 64 * 64 // 2
    assert np.array_equal(decode_gif(d), img)


def test_gif_rejects_garbage_and_too_many_colors():
    with pytest.raises(GifCodecError, match="not a GIF"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    rng = np.random.default_rng(6)
    noisy = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(GifCodecError, match="256"):
        encode_gif(noisy)  # ~1024 unique colors


def test_gif_truncated_stream_errors():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 16, (10, 10))]
    d = encode_gif(img)
    with pytest.raises(GifCodecError):
        decode_gif(d[: len(d) // 2])


def test_gif_deferred_clear_stream():
    """Foreign encoders may NEVER emit CLEAR once the dictionary
    fills ('deferred clear'): codes stay ≤ 4095 and both sides freeze
    the table at 4096 entries. Hand-roll a literal-only stream long
    enough to fill the table and check the decoder tracks it."""
    import struct

    rng = np.random.default_rng(8)
    idx = rng.integers(0, 256, 6000, dtype=np.uint8)
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    emit(clear, width)
    table_len = eoi + 1
    prev = None
    for b in idx:
        emit(int(b), width)
        if prev is not None and table_len < 4096:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
        prev = int(b)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)

    # wrap in a minimal GIF container: 6000 = 100 x 60 image
    w, h = 100, 60
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    gif = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    gif += bytes([0x80 | 7, 0, 0]) + pal.tobytes()
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    gif += bytes([0x00, min_code])
    for off in range(0, len(out), 255):
        block = out[off : off + 255]
        gif += bytes([len(block)]) + block
    gif += b"\x00\x3B"
    decoded = decode_gif(bytes(gif))
    assert np.array_equal(decoded[:, :, 0], idx.reshape(h, w))


def test_gif_animated_frames_roundtrip():
    """encode_gif_animated → decode_gif_frames reproduces every frame
    bit-exactly (shared palette, plain + interlaced), and decode_gif
    still returns frame 0."""
    from sqlpp_spark.ops.gifcodec import decode_gif_frames, encode_gif_animated

    gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    yy, xx = np.mgrid[0:9, 0:12]
    frames = [gray[((xx + 3 * yy + 5 + 7 * f) % 256)] for f in range(4)]
    for il in (False, True):
        d = encode_gif_animated(frames, interlace=il)
        out = decode_gif_frames(d)
        assert len(out) == 4
        for f, (a, b) in enumerate(zip(out, frames)):
            assert np.array_equal(a, b), (il, f)
        assert np.array_equal(decode_gif(d), frames[0])


def test_gif_frames_composite_subframes():
    """A later frame covering only part of the screen composites over
    the previous frame (disposal none)."""
    import struct

    from sqlpp_spark.ops.gifcodec import _lzw_encode, decode_gif_frames

    pal = np.array([[10, 10, 10], [200, 50, 50]], dtype=np.uint8)
    # frame 1: full 4x4 of color 0; frame 2: 2x2 of color 1 at (1,1);
    # depth 0 → a 2-entry (6-byte) global color table
    gif = bytearray(b"GIF89a") + struct.pack("<HH", 4, 4)
    gif += bytes([0x80 | 0, 0, 0]) + pal.tobytes()
    for (x0, y0, w, h, color) in ((0, 0, 4, 4, 0), (1, 1, 2, 2, 1)):
        gif += bytes([0x2C]) + struct.pack("<HHHH", x0, y0, w, h)
        gif += bytes([0x00, 2])
        lzw = _lzw_encode(np.full(w * h, color, dtype=np.uint8), 2)
        gif += bytes([len(lzw)]) + lzw + b"\x00"
    gif += b"\x3B"
    frames = decode_gif_frames(bytes(gif))
    assert len(frames) == 2
    assert (frames[0] == pal[0]).all()
    assert np.array_equal(frames[1][1:3, 1:3], np.broadcast_to(pal[1], (2, 2, 3)))
    assert np.array_equal(frames[1][0, :], np.broadcast_to(pal[0], (4, 3)))


def test_gif_opaque_frame_restores_alpha():
    """Round-8 review finding: an opaque frame painted over previously
    transparent pixels must make them opaque again (alpha 255)."""
    import struct

    from sqlpp_spark.ops.gifcodec import _lzw_encode, decode_gif_frames

    pal = np.array([[10, 10, 10], [200, 50, 50]], dtype=np.uint8)
    gif = bytearray(b"GIF89a") + struct.pack("<HH", 4, 4)
    gif += bytes([0x80 | 0, 0, 0]) + pal.tobytes()
    # frame 1: transparent index 0 everywhere (GCE transparency on)
    gif += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 4, 4)
    gif += bytes([0x00, 2])
    lzw = _lzw_encode(np.zeros(16, dtype=np.uint8), 2)
    gif += bytes([len(lzw)]) + lzw + b"\x00"
    # frame 2: fully opaque color 1, NO transparency flag
    gif += bytes([0x21, 0xF9, 4, 0x00, 0, 0, 0, 0])
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 4, 4)
    gif += bytes([0x00, 2])
    lzw = _lzw_encode(np.ones(16, dtype=np.uint8), 2)
    gif += bytes([len(lzw)]) + lzw + b"\x00"
    gif += b"\x3B"
    frames = decode_gif_frames(bytes(gif))
    assert len(frames) == 2
    assert (frames[0][:, :, 3] == 0).all()  # frame 1 all-transparent
    assert (frames[1][:, :, 3] == 255).all()  # frame 2 fully opaque
    assert (frames[1][:, :, :3] == pal[1]).all()


def test_gif_gce_scope_is_one_rendering_block():
    """Round-8 ADVICE finding: a GCE's transparent index applies only
    to the single next rendering block (GIF89a 23(c)).  A second frame
    with NO GCE of its own must not inherit frame 1's transparent
    index — it is fully opaque and repaints every pixel."""
    import struct

    from sqlpp_spark.ops.gifcodec import _lzw_encode, decode_gif_frames

    pal = np.array([[10, 10, 10], [200, 50, 50]], dtype=np.uint8)
    gif = bytearray(b"GIF89a") + struct.pack("<HH", 4, 4)
    gif += bytes([0x80 | 0, 0, 0]) + pal.tobytes()
    # frame 1: GCE with transparent index 0, all pixels index 0
    gif += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 4, 4)
    gif += bytes([0x00, 2])
    lzw = _lzw_encode(np.zeros(16, dtype=np.uint8), 2)
    gif += bytes([len(lzw)]) + lzw + b"\x00"
    # frame 2: NO GCE at all, all pixels index 0 (same index that was
    # transparent in frame 1 — now plain opaque color 0)
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 4, 4)
    gif += bytes([0x00, 2])
    gif += bytes([len(lzw)]) + lzw + b"\x00"
    gif += b"\x3B"
    frames = decode_gif_frames(bytes(gif))
    assert len(frames) == 2
    assert (frames[0][:, :, 3] == 0).all()  # frame 1 all-transparent
    # frame 2 inherited NO transparency: fully opaque, color 0 painted
    assert (frames[1][:, :, 3] == 255).all()
    assert (frames[1][:, :, :3] == pal[0]).all()


def test_gif_info_truncated_header_raises_codec_error():
    from sqlpp_spark.ops.gifcodec import GifCodecError, gif_info

    with pytest.raises(GifCodecError):
        gif_info(b"GIF89a" + b"\x00\x01\x00\x01")
