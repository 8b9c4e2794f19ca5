"""Unit tests for the pure-numpy image codec (no Spark session)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sqlpp_spark.ops.imagecodec import (
    PNG_SIGNATURE,
    ImageCodecError,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_jpeg_lossless,
    encode_png,
    jpeg_info,
    png_info,
    resize_array,
)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_png_roundtrip_exact(ch, filter_type):
    rng = np.random.default_rng(7 * ch + filter_type)
    a = rng.integers(0, 256, (13, 17, ch), dtype=np.uint8)
    b = encode_png(a, filter_type=filter_type)
    assert png_info(b) == (17, 13, ch)
    d = decode_png(b)
    assert d.shape == (13, 17, ch) and (d == a).all()


def test_png_decode_average_and_paeth_filters():
    """Foreign PNG streams use Average/Paeth; hand-build one per the
    spec's filter equations and require exact reconstruction."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch).astype(int)
    rows = []
    for y in range(h):
        ftype = 3 if y % 2 == 0 else 4
        prev = flat[y - 1] if y > 0 else np.zeros(w * ch, int)
        cur = flat[y]
        line = []
        for x in range(w * ch):
            left = cur[x - ch] if x >= ch else 0
            ul = prev[x - ch] if x >= ch else 0
            up = prev[x]
            if ftype == 3:
                line.append((cur[x] - ((left + up) >> 1)) & 0xFF)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                line.append((cur[x] - pred) & 0xFF)
        rows.append(bytes([ftype]) + bytes(line))

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF)
        )

    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == a).all()


def test_png_grayscale_2d_input():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    d = decode_png(encode_png(a))
    assert d.shape == (8, 8, 1) and (d[:, :, 0] == a).all()


def test_png_info_palette_trns_reports_rgba():
    """Round-8 ADVICE finding: png_info must agree with decode_png on
    channel count for palette PNGs — a tRNS chunk promotes the decode
    to RGBA, so the metadata must say 4 channels."""
    from sqlpp_spark.ops.imagecodec import encode_png_palette

    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    plain = encode_png_palette(img)
    assert png_info(plain)[2] == 3
    assert decode_png(plain).shape[2] == 3
    with_trns = encode_png_palette(img, trns=np.array([0, 255, 255]))
    assert png_info(with_trns)[2] == 4
    assert decode_png(with_trns).shape[2] == 4


def test_png_rejects_garbage():
    with pytest.raises(ImageCodecError):
        decode_png(b"not a png at all")
    with pytest.raises(ImageCodecError):
        png_info(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10)


def test_jpeg_sof_parse():
    jpg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + b"\x00" * 9
        + b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc2" + struct.pack(">H", 17)  # progressive SOF2
        + struct.pack(">BHHB", 8, 1080, 1920, 3) + b"\x00" * 9
        + b"\xff\xd9"
    )
    assert jpeg_info(jpg) == (1920, 1080, 3)
    with pytest.raises(ImageCodecError):
        jpeg_info(b"\xff\xd8\xff\xd9")


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(h + w - 2, 1)],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_roundtrip_gradient_tolerance():
    """Baseline JPEG is lossy but must stay close on smooth content:
    encode→decode of a gradient at q90 within a few code values, and
    the SOF geometry of our own streams parses exactly."""
    img = _gradient(41, 57)
    data = encode_jpeg(img, quality=90)
    assert jpeg_info(data) == (57, 41, 3)
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_jpeg_roundtrip_grayscale_and_odd_sizes():
    for h, w in ((8, 8), (1, 1), (9, 17), (16, 5)):
        g = _gradient(h, w)[..., 0]
        out = decode_jpeg(encode_jpeg(g, quality=92))
        assert out.shape == (h, w, 1)
        assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 6


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 exercises the decoder's MCU interleave (4Y+Cb+Cr) and
    chroma-upsample path: constant-chroma content round-trips nearly
    exactly; colorful gradients stay within chroma-averaging
    tolerance; the stream is smaller than 4:4:4."""
    h, w = 37, 51
    yy, xx = np.mgrid[0:h, 0:w]
    gray3 = np.repeat(
        ((xx + yy) * 255 // (h + w - 2)).astype(np.uint8)[:, :, None], 3, axis=2
    )
    d420 = encode_jpeg(gray3, quality=90, subsampling="420")
    assert jpeg_info(d420) == (w, h, 3)
    o = decode_jpeg(d420)
    assert np.abs(o.astype(int) - gray3.astype(int)).max() <= 2

    img = _gradient(h, w)
    d420c = encode_jpeg(img, quality=90, subsampling="420")
    d444c = encode_jpeg(img, quality=90, subsampling="444")
    assert len(d420c) < len(d444c)
    oc = decode_jpeg(d420c)
    assert np.abs(oc.astype(int) - img.astype(int)).mean() <= 4.0

    # 4:2:2 exercises the asymmetric (h=2, v=1) MCU/upsample path
    o422 = decode_jpeg(encode_jpeg(img, quality=90, subsampling="422"))
    assert o422.shape == img.shape
    assert np.abs(o422.astype(int) - img.astype(int)).mean() <= 3.0

    with pytest.raises(ImageCodecError, match="subsampling"):
        encode_jpeg(img, subsampling="411")


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn streams decode correctly: byte-aligned restart markers
    and DC-predictor resets at every interval, for both 4:4:4 and
    4:2:0 (multi-block MCUs) and for back-to-back restarts (ri=1)."""
    img = _gradient(33, 47)  # 5x6 MCUs at 4:4:4
    for ri in (1, 2, 7):
        for ss in ("444", "420"):
            data = encode_jpeg(img, quality=90, subsampling=ss,
                               restart_interval=ri)
            out = decode_jpeg(data)
            assert out.shape == img.shape
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    # a restart stream must actually contain RST markers
    d = encode_jpeg(img, quality=90, restart_interval=2)
    assert any(b"\xff" + bytes([0xD0 + i]) in d for i in range(8))


def test_jpeg_quality_monotonic_error():
    """Lower quality ⇒ no smaller mean reconstruction error (and far
    smaller payload) — pins that the quality knob actually scales the
    quantization tables."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    errs, sizes = [], []
    for q in (95, 50, 10):
        d = encode_jpeg(img, quality=q)
        o = decode_jpeg(d)
        errs.append(float(np.abs(o.astype(int) - img.astype(int)).mean()))
        sizes.append(len(d))
    assert errs[0] <= errs[1] <= errs[2]
    assert sizes[0] > sizes[1] > sizes[2]


def test_jpeg_rejects_scanless_progressive_and_lossless_sof():
    # progressive is SUPPORTED now, but a SOF2 stream with no scan data
    # must still error (not return uninitialized pixels)...
    jpg = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", 17)  # SOF2 progressive
        + struct.pack(">BHHB", 8, 10, 20, 3) + b"\x00" * 9
        + b"\xff\xd9"
    )
    with pytest.raises(ImageCodecError, match="SOS"):
        decode_jpeg(jpg)
    assert jpeg_info(jpg) == (20, 10, 3)
    # ...SOF3 lossless is SUPPORTED now: a scanless stream errors the
    # same way (no uninitialized pixels), geometry still recovers...
    jpg3 = (
        b"\xff\xd8"
        + b"\xff\xc3" + struct.pack(">H", 17)  # SOF3 lossless
        + struct.pack(">BHHB", 8, 10, 20, 3) + b"\x00" * 9
        + b"\xff\xd9"
    )
    with pytest.raises(ImageCodecError, match="SOS"):
        decode_jpeg(jpg3)
    assert jpeg_info(jpg3) == (20, 10, 3)
    # ...and the remaining non-supported families (hierarchical SOF5)
    # still reject while jpeg_info recovers geometry.
    jpg5 = (
        b"\xff\xd8"
        + b"\xff\xc5" + struct.pack(">H", 17)  # SOF5 hierarchical
        + struct.pack(">BHHB", 8, 10, 20, 3) + b"\x00" * 9
        + b"\xff\xd9"
    )
    with pytest.raises(ImageCodecError, match="SOF5"):
        decode_jpeg(jpg5)
    assert jpeg_info(jpg5) == (20, 10, 3)


def test_progressive_decodes_bit_equal_to_baseline():
    """Progressive and baseline encoders share the quantizer, so the
    decoded pixels must be IDENTICAL — any deviation is a bug in the
    scan coding (spectral selection, successive approximation, EOB
    runs or correction bits), not quantization noise."""
    from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

    for sub in ("444", "422", "420"):
        for h, w in ((16, 16), (41, 57), (9, 17)):
            img = _gradient(h, w)
            base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
            prog_bytes = encode_jpeg_progressive(img, quality=85, subsampling=sub)
            assert jpeg_info(prog_bytes) == (w, h, 3)
            prog = decode_jpeg(prog_bytes)
            assert np.array_equal(base, prog), (sub, h, w)


def test_progressive_grayscale_and_noise_bit_equal():
    from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    for img in (noise, _gradient(19, 23)[..., 0]):
        base = decode_jpeg(encode_jpeg(img, quality=75))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=75))
        assert np.array_equal(base, prog)


def test_progressive_spectral_only_script():
    """A spectral-selection-only script (no successive approximation)
    also reproduces baseline pixels — isolates the band-splitting path
    from the refinement path."""
    from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

    img = _gradient(20, 26)
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),  # DC, no point transform
        ([0], 1, 9, 0, 0),
        ([0], 10, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=85, scans=scans))
    assert np.array_equal(base, prog)


def test_progressive_eob_runs_exercised():
    """A smooth dark image makes most high-frequency bands all-zero →
    long EOB runs (EOBn, n>0) in the AC scans; decode must still be
    bit-equal, proving the EOBn accumulate/flush paths on both sides."""
    from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

    img = np.full((64, 64, 3), 40, dtype=np.uint8)
    img[10:14, 10:14] = 200  # one feature so not everything is EOB
    data = encode_jpeg_progressive(img, quality=85)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.array_equal(base, decode_jpeg(data))


def test_progressive_per_component_dc_scans():
    """DC scans may be NON-interleaved (one component per SOS): with
    4:2:0 chroma the per-component block raster differs from the
    MCU-padded grid, so this pins the decoder's single-component DC
    path (and its _comp_block_dims arithmetic) against baseline."""
    from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

    img = _gradient(21, 37)
    scans = [
        ([0], 0, 0, 0, 0),   # per-component DC, no point transform
        ([1], 0, 0, 0, 0),
        ([2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    for sub in ("444", "420"):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsampling=sub, scans=scans)
        )
        assert np.array_equal(base, prog), sub


def test_progressive_restart_intervals():
    from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

    img = _gradient(33, 49)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, restart_interval=3)
    )
    assert np.array_equal(base, prog)


def test_progressive_truncation_rejected_cleanly():
    """Truncating a progressive stream anywhere must raise
    ImageCodecError or still decode (prefix scans are valid previews) —
    never crash with a foreign exception."""
    from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

    data = encode_jpeg_progressive(_gradient(17, 13), quality=80)
    for cut in range(2, len(data), 97):
        try:
            out = decode_jpeg(data[:cut])
            assert out.shape == (17, 13, 3)  # decoded from prefix scans
        except ImageCodecError:
            pass


def test_resize_nearest_quadrants():
    a = np.array([[[0], [255]], [[255], [0]]], dtype=np.uint8)
    n = resize_array(a, 4, 4, "nearest")
    assert n.shape == (4, 4, 1)
    assert (n[:2, :2] == 0).all() and (n[:2, 2:] == 255).all()
    assert (n[2:, :2] == 255).all() and (n[2:, 2:] == 0).all()


def test_resize_bilinear_identity_and_bounds():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    assert (resize_array(a, 24, 32, "bilinear") == a).all()
    up = resize_array(a, 48, 64, "bilinear")
    assert up.shape == (64, 48, 3)
    assert up.min() >= a.min() and up.max() <= a.max()


# -- property-based (hypothesis) --------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        filter_type=st.sampled_from([0, 1, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_roundtrip_property(h, w, ch, filter_type, seed):
        """encode→decode is the identity for every shape/channel/filter
        combination, including 1-pixel and single-row/column images."""
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        d = decode_png(encode_png(a, filter_type=filter_type))
        assert d.shape == (h, w, ch) and (d == a).all()

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 16), w=st.integers(1, 16),
        th=st.integers(1, 32), tw=st.integers(1, 32),
        method=st.sampled_from(["nearest", "bilinear"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_resize_property_shape_and_range(h, w, th, tw, method, seed):
        """resize always produces the requested shape with values
        inside the input's range (both methods are interpolating)."""
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = resize_array(a, tw, th, method)
        assert out.shape == (th, tw, 3)
        assert out.min() >= a.min() and out.max() <= a.max()

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ch=st.sampled_from([1, 3]),
        quality=st.integers(60, 98),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_jpeg_roundtrip_property(h, w, ch, quality, seed):
        """encode→decode never errors, preserves shape exactly, and —
        on constant images, which quantize losslessly at any quality —
        reconstructs within a small tolerance."""
        rng = np.random.default_rng(seed)
        flat = np.full((h, w, ch), int(rng.integers(0, 256)), dtype=np.uint8)
        a = flat.squeeze(-1) if ch == 1 else flat
        out = decode_jpeg(encode_jpeg(a, quality=quality))
        assert out.shape == (h, w, ch)
        assert np.abs(out.astype(int) - flat.astype(int)).max() <= 3

    @settings(max_examples=20, deadline=None)
    @given(data=st.binary(min_size=0, max_size=200))
    def test_codec_rejects_arbitrary_bytes_cleanly(data):
        """Garbage never crashes with anything but ImageCodecError."""
        for fn in (decode_png, png_info, jpeg_info, decode_jpeg):
            try:
                fn(data)
            except ImageCodecError:
                pass

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        ch=st.sampled_from([1, 3]),
        quality=st.integers(50, 98),
        sub=st.sampled_from(["444", "422", "420"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_progressive_equals_baseline_property(h, w, ch, quality, sub, seed):
        """Random content, size, quality, subsampling: the progressive
        stream must decode to EXACTLY the baseline stream's pixels —
        the two encoders share the quantizer, so any pixel delta is a
        scan-coding bug (not quantization noise)."""
        from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

        rng = np.random.default_rng(seed)
        # piecewise-smooth + noise: exercises EOB runs AND dense bands
        a = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        a[: h // 2, : w // 2] = 30
        img = a.squeeze(-1) if ch == 1 else a
        base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=quality, subsampling=sub)
        )
        assert np.array_equal(base, prog)

    @settings(max_examples=20, deadline=None)
    @given(
        cut_frac=st.floats(0.05, 0.99),
        flip_pos=st.integers(0, 10_000),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_progressive_corruption_never_crashes(cut_frac, flip_pos, seed):
        """Truncated or bit-flipped progressive streams either decode
        (prefix scans / benign flip) or raise ImageCodecError — never a
        foreign exception or hang."""
        from sqlpp_spark.ops.imagecodec import encode_jpeg_progressive

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (17, 21, 3), dtype=np.uint8)
        data = bytearray(encode_jpeg_progressive(img, quality=80))
        trunc = bytes(data[: max(2, int(len(data) * cut_frac))])
        flipped = bytearray(data)
        flipped[flip_pos % len(data)] ^= 0x41
        for payload in (trunc, bytes(flipped)):
            try:
                out = decode_jpeg(payload)
                assert out.shape[2] in (1, 3)
            except ImageCodecError:
                pass


def test_jpeg_fill_bytes_before_restart_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker. Foreign encoders pad restart markers this way; the decoder
    must skip the padding and still validate/consume the RSTn (ADVICE
    r7: skip_marker used to return the cached 0xFF instead of the real
    marker found after the fill bytes)."""
    img = _gradient(33, 47)
    data = encode_jpeg(img, quality=90, subsampling="444", restart_interval=2)
    ref = decode_jpeg(data)
    # pad every restart marker in the entropy-coded segment (after SOS)
    sos = data.index(b"\xff\xda")
    head, scan = data[:sos], bytearray(data[sos:])
    padded = bytearray()
    i = 0
    n_padded = 0
    while i < len(scan):
        if (
            scan[i] == 0xFF
            and i + 1 < len(scan)
            and 0xD0 <= scan[i + 1] <= 0xD7
        ):
            padded += b"\xff\xff"  # two fill bytes before the marker
            padded += scan[i : i + 2]
            i += 2
            n_padded += 1
        else:
            padded.append(scan[i])
            i += 1
    assert n_padded > 0, "fixture must actually contain restart markers"
    out = decode_jpeg(bytes(head) + bytes(padded))
    assert np.array_equal(out, ref)


def test_jpeg_lossless_roundtrip_all_predictors():
    """SOF3 lossless: encode → decode is BIT-EXACT for every predictor
    (1-7), grayscale and RGB, random content."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    g = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    for pred in range(1, 8):
        out = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
        assert out.dtype == np.uint8 and np.array_equal(out, img), pred
    out = decode_jpeg(encode_jpeg_lossless(g, predictor=4))
    assert np.array_equal(out[:, :, 0], g)


def test_jpeg_lossless_high_precision():
    """SOF3 carries 2-16 bit samples: 12-bit (DICOM-style) and full
    16-bit planes round-trip bit-exactly as uint16."""
    rng = np.random.default_rng(6)
    img16 = rng.integers(0, 65536, (12, 14), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(img16, predictor=7))
    assert out.dtype == np.uint16 and np.array_equal(out[:, :, 0], img16)
    img12 = rng.integers(0, 4096, (9, 11)).astype(np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(img12, predictor=4, precision=12))
    assert np.array_equal(out[:, :, 0], img12)


def test_jpeg_lossless_compresses_smooth_content():
    """Predictive coding must actually compress: a smooth gradient
    codes far below raw size (and still round-trips exactly)."""
    yy, xx = np.mgrid[0:64, 0:64]
    grad = ((xx + yy) % 256).astype(np.uint8)
    d = encode_jpeg_lossless(grad, predictor=4)
    assert len(d) < 64 * 64 // 4
    assert np.array_equal(decode_jpeg(d)[:, :, 0], grad)


def test_jpeg_lossless_point_transform():
    """Pt > 0 (near-lossless mode): decode returns the Pt-shifted
    reconstruction ((v >> Pt) << Pt) exactly."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (10, 12), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=4, point_transform=2))
    assert np.array_equal(out[:, :, 0], (img >> 2) << 2)


def test_jpeg_lossless_rejects_bad_args():
    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ImageCodecError, match="predictor"):
        encode_jpeg_lossless(img, predictor=0)
    with pytest.raises(ImageCodecError, match="precision"):
        encode_jpeg_lossless(img, precision=1)


def test_png_full_format_matrix():
    """PNG core-format completeness: bit depths 1/2/4/8/16, palette
    (PLTE + tRNS), Adam7 interlace, every encode filter — all
    round-trip bit-exactly (Adam7 coverage itself is asserted: each
    pixel in exactly one pass)."""
    from sqlpp_spark.ops.imagecodec import (
        _ADAM7, encode_png_gray, encode_png_palette,
    )

    cover = np.zeros((16, 16), dtype=int)
    for x0, y0, dx, dy in _ADAM7:
        cover[y0::dy, x0::dx] += 1
    assert (cover == 1).all()

    rng = np.random.default_rng(1)
    for shape in ((7, 9), (8, 8, 3), (5, 6, 4), (1, 1), (9, 1), (1, 9)):
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        exp = a if a.ndim == 3 else a[:, :, None]
        for ft in (0, 1, 2):
            for il in (False, True):
                out = decode_png(encode_png(a, filter_type=ft, interlace=il))
                assert np.array_equal(out, exp), (shape, ft, il)

    a16 = rng.integers(0, 65536, (9, 7, 3), dtype=np.uint16)
    for il in (False, True):
        out = decode_png(encode_png(a16, interlace=il))
        assert out.dtype == np.uint16 and np.array_equal(out, a16)

    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    rgb = pal[rng.integers(0, 4, (11, 13), dtype=np.uint8)]
    for depth in (2, 4, 8):
        for il in (False, True):
            out = decode_png(encode_png_palette(rgb, depth=depth, interlace=il))
            assert np.array_equal(out, rgb), (depth, il)
    out = decode_png(
        encode_png_palette(rgb, depth=4, trns=np.array([255, 128, 0, 7]))
    )
    assert out.shape == (11, 13, 4) and np.array_equal(out[:, :, :3], rgb)

    for depth in (1, 2, 4):
        g = rng.integers(0, 1 << depth, (6, 10), dtype=np.uint8)
        scale = 255 // ((1 << depth) - 1)
        for il in (False, True):
            out = decode_png(encode_png_gray(g, depth, interlace=il))
            assert np.array_equal(out[:, :, 0], g * scale), (depth, il)


def test_png_rejects_malformed_palette_and_depth():
    from sqlpp_spark.ops.imagecodec import encode_png_palette

    rng = np.random.default_rng(2)
    many = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ImageCodecError, match="palette"):
        encode_png_palette(many, depth=2)  # >4 unique colors
    # invalid depth/color-type combination rejects at decode
    bad = bytearray(encode_png(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)))
    bad[24] = 4  # IHDR bit depth byte: RGB at depth 4 is invalid
    with pytest.raises(ImageCodecError):
        decode_png(bytes(bad))


def test_exif_roundtrip_orientations_and_malformed():
    """EXIF 2.3 IFD grammar: write/parse round-trip (inline + offset
    string values, sub-IFD pointer, both endians), all 8 orientation
    transforms invert correctly, malformed contract."""
    import numpy as np

    from sqlpp_spark.ops.exif import (
        TAG_DT_ORIGINAL, TAG_MAKE, TAG_ORIENTATION, TAG_PIXEL_X,
        ExifError, apply_orientation, build_exif_tiff, exif_from_jpeg,
        insert_exif_app1, parse_exif_tiff,
    )

    img = np.arange(80, dtype=np.uint8).reshape(8, 10)
    jpg = encode_jpeg(np.stack([img] * 3, axis=-1))
    for o in range(1, 9):
        ex = build_exif_tiff(o, "A" * 20, "2026:02:03 04:05:06", 10, 8,
                             dt_original="2026:02:02 01:01:01")
        tags = exif_from_jpeg(insert_exif_app1(jpg, ex))
        assert tags[TAG_ORIENTATION] == [o]
        assert tags[TAG_MAKE] == "A" * 20  # offset-stored ASCII
        assert tags[TAG_DT_ORIGINAL] == "2026:02:02 01:01:01"
        assert tags[TAG_PIXEL_X] == [10]
    # short make stays inline (<= 4 bytes incl. NUL)
    ex = build_exif_tiff(1, "abc", "2026:01:01 00:00:00", 3, 3)
    assert exif_from_jpeg(insert_exif_app1(jpg, ex))[TAG_MAKE] == "abc"
    # orientation transforms invert (6 <-> 8, 2/3/4 self-ish)
    a = np.arange(12).reshape(3, 4)
    assert (apply_orientation(apply_orientation(a, 6), 8) == a).all()
    for o in (2, 3, 4):
        assert (apply_orientation(apply_orientation(a, o), o) == a).all()
    with pytest.raises(ExifError):
        apply_orientation(a, 9)
    for bad in (b"", b"\xff\xd8no markers", jpg):  # jpg lacks APP1
        with pytest.raises(ExifError):
            exif_from_jpeg(bad)
    with pytest.raises(ExifError):
        parse_exif_tiff(b"II\x2b\x00\x08\x00\x00\x00")  # bad magic


def test_exif_jpeg_fill_bytes_before_markers():
    """T.81 §B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes. ADVICE r9: the walk used to treat the fill as the
    marker byte and read a bogus segment length, so spec-valid files
    degraded to decoded=false; now fill runs are skipped."""
    import numpy as np

    from sqlpp_spark.ops.exif import (
        TAG_MAKE, TAG_ORIENTATION, build_exif_tiff, exif_from_jpeg,
        insert_exif_app1,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    jpg = insert_exif_app1(
        encode_jpeg(img),
        build_exif_tiff(6, "fillco", "2026:01:01 00:00:00", 8, 8),
    )
    # inject 0xFF fill runs after SOI (before APP1) and again before
    # the next marker after the APP1 segment
    assert jpg[:2] == b"\xff\xd8" and jpg[2:4] == b"\xff\xe1"
    seglen = int.from_bytes(jpg[4:6], "big")
    app1_end = 2 + 2 + seglen
    filled = (jpg[:2] + b"\xff" * 3 + jpg[2:app1_end]
              + b"\xff" * 5 + jpg[app1_end:])
    tags = exif_from_jpeg(filled)
    assert tags[TAG_ORIENTATION] == [6]
    assert tags[TAG_MAKE] == "fillco"
