"""VP8 lossy decode conformance against the system libwebp.

VP8 reconstruction is normative down to the bit (RFC 6386 §2), so the
conformance statement is BIT-EXACT equality of Y/U/V planes between
ops/vp8codec.py and libwebp's own decoder (`WebPDecodeYUV`) on
libwebp-ENCODED streams. RGB conversion is application-defined and
NOT compared (libwebp applies a fancy upsampler; we apply standard
BT.601 — see vp8_to_rgb).

Three sections:

- Known-answer vectors: committed base64 of libwebp 1.2.4 lossy
  encodes plus SHA-256 digests of the conforming YUV planes — holds
  with NO library present.
- Simple-API interop (skips without `libwebp.so.7`): content classes
  x qualities x geometries, covering B_PRED-heavy noise, 16x16-mode
  gradients, segmentation-enabled large frames, and odd dimensions.
- Advanced-API interop via ctypes structs (WebPConfig/WebPPicture for
  ABI 0x020f): forces the header paths the simple API never emits —
  the SIMPLE loop filter, nonzero sharpness, multiple token
  partitions, and segment quantizer spreads under high SNS.
"""

from __future__ import annotations

import base64
import ctypes
import ctypes.util
import hashlib

import numpy as np
import pytest

from sqlpp_spark.ops.vp8codec import (
    CONFORMANCE_STREAMS,
    decode_vp8,
    vp8_to_rgb,
)
from sqlpp_spark.ops.webpcodec import decode_webp

# ---------------------------------------------------------------------------
# Known-answer vectors.
# ---------------------------------------------------------------------------

# Streams live in ops/vp8codec.py (CONFORMANCE_STREAMS — shipped to
# executors for the registry oracle); the digests pin the conforming
# YUV planes here.
KAT_DIGESTS = {
    "noise48_q75": (
        "f28846bad78ab0042f9c87b460e5734a",
        "f249bf10ada0a2794552c11e796e33a5",
        "223c84469c4332126fd162581d25c689",
    ),
    "grad64x80_q40": (
        "484a7983afe78161eb0cf28e82c87746",
        "b9ae76375a9b2481e115198840c26b20",
        "e28f0b4d08921157680ca3b055c5f9fc",
    ),
    "mixed33x47_q90": (
        "4817f14fe5720db11cf497fcc92f93af",
        "170aae10d01a0c698ecd433213effe96",
        "4b5a83adb940ce195a7cb978ce2a68af",
    ),
}


def _vp8_chunk(data: bytes) -> bytes:
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        ln = int.from_bytes(data[pos + 4:pos + 8], "little")
        if tag == b"VP8 ":
            return data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise AssertionError("no VP8 chunk")


@pytest.mark.parametrize("name", sorted(KAT_DIGESTS))
def test_vp8_known_answer_vectors(name):
    dy, du, dv = KAT_DIGESTS[name]
    data = base64.b64decode(CONFORMANCE_STREAMS[name])
    y, u, v = decode_vp8(_vp8_chunk(data))
    for plane, want in ((y, dy), (u, du), (v, dv)):
        assert hashlib.sha256(plane.tobytes()).hexdigest()[:32] == want


def test_decode_webp_lossy_rgb_path():
    data = base64.b64decode(CONFORMANCE_STREAMS["grad64x80_q40"])
    rgb = decode_webp(data)
    assert rgb.shape == (64, 80, 3) and rgb.dtype == np.uint8
    y, u, v = decode_vp8(_vp8_chunk(data))
    assert np.array_equal(rgb, vp8_to_rgb(y, u, v))


# ---------------------------------------------------------------------------
# Live interop — simple API.
# ---------------------------------------------------------------------------


class _LibWebpLossy:
    def __init__(self, lib: ctypes.CDLL) -> None:
        lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeRGBA.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPDecodeYUV.restype = ctypes.c_void_p
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        self.lib = lib

    def encode(self, arr: np.ndarray, q: float) -> bytes:
        h, w, _ = arr.shape
        buf = np.ascontiguousarray(arr, np.uint8)
        out = ctypes.c_void_p()
        n = self.lib.WebPEncodeRGBA(
            buf.ctypes.data, w, h, w * 4, float(q), ctypes.byref(out)
        )
        assert n and out.value, "libwebp lossy encode failed"
        try:
            return ctypes.string_at(out.value, n)
        finally:
            self.lib.WebPFree(out)

    def decode_yuv(self, data: bytes):
        w = ctypes.c_int()
        h = ctypes.c_int()
        u = ctypes.c_void_p()
        v = ctypes.c_void_p()
        st = ctypes.c_int()
        uvst = ctypes.c_int()
        y = self.lib.WebPDecodeYUV(
            data, len(data), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(u), ctypes.byref(v),
            ctypes.byref(st), ctypes.byref(uvst),
        )
        assert y, "libwebp YUV decode failed"
        try:
            cw, ch = (w.value + 1) // 2, (h.value + 1) // 2
            yarr = np.frombuffer(
                ctypes.string_at(y, st.value * h.value), np.uint8
            ).reshape(h.value, st.value)[:, :w.value].copy()
            uarr = np.frombuffer(
                ctypes.string_at(u.value, uvst.value * ch), np.uint8
            ).reshape(ch, uvst.value)[:, :cw].copy()
            varr = np.frombuffer(
                ctypes.string_at(v.value, uvst.value * ch), np.uint8
            ).reshape(ch, uvst.value)[:, :cw].copy()
        finally:
            self.lib.WebPFree(y)
        return yarr, uarr, varr


@pytest.fixture(scope="module")
def libwebp():
    for name in ("libwebp.so.7", "libwebp.so",
                 ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            return _LibWebpLossy(ctypes.CDLL(name))
        except OSError:
            continue
    pytest.skip("system libwebp not available")


def _assert_conforms(libwebp, arr: np.ndarray, q: float) -> None:
    data = libwebp.encode(arr, q)
    ry, ru, rv = libwebp.decode_yuv(data)
    my, mu, mv = decode_vp8(_vp8_chunk(data))
    assert np.array_equal(my, ry), f"Y mismatch q={q} shape={arr.shape}"
    assert np.array_equal(mu, ru), f"U mismatch q={q} shape={arr.shape}"
    assert np.array_equal(mv, rv), f"V mismatch q={q} shape={arr.shape}"


def _images() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:64, 0:80]
    imgs: dict[str, np.ndarray] = {}
    imgs["gradient"] = np.dstack(
        [(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256,
         np.full_like(x, 255)]
    ).astype(np.uint8)
    n = rng.integers(0, 256, (48, 48, 4), dtype=np.uint8)
    n[..., 3] = 255
    imgs["noise"] = n
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    imgs["graynoise"] = np.dstack([g, g, g, np.full_like(g, 255)])
    imgs["flat"] = np.full((16, 16, 4), (120, 60, 200, 255), np.uint8)
    return imgs


@pytest.mark.parametrize("q", [100, 75, 40, 10])
def test_interop_content_classes(libwebp, q):
    for arr in _images().values():
        _assert_conforms(libwebp, arr, q)


def test_interop_odd_geometries(libwebp):
    rng = np.random.default_rng(42)
    for (h, w) in [(1, 1), (17, 13), (33, 47), (5, 300), (300, 5)]:
        y, x = np.mgrid[0:h, 0:w]
        arr = np.dstack(
            [(x * 7 + y * 3) % 256, (255 - x * 2) % 256,
             (x * x // 9 + y) % 256, np.full((h, w), 255)]
        ).astype(np.uint8)
        arr[..., :3] ^= rng.integers(0, 32, (h, w, 3), dtype=np.uint8)
        for q in (90, 50, 5):
            _assert_conforms(libwebp, arr, q)


def test_interop_segmentation_and_strong_filter(libwebp):
    """Large mixed-content frames: libwebp enables segmentation with
    per-segment quantizers and drives the loop filter to max level."""
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:320, 0:480]
    base = 128 + 90 * np.sin(x / 23.0) + 70 * np.cos(y / 31.0)
    arr = np.dstack(
        [np.clip(base, 0, 255), np.clip(base[::-1], 0, 255),
         (x + y) // 4 % 256, np.full((320, 480), 255)]
    ).astype(np.uint8)
    arr[100:150, :, 0] = rng.integers(0, 256, (50, 480))
    arr[:, 200:260, 1] = rng.integers(0, 256, (320, 60))
    for q in (95, 60, 25):
        _assert_conforms(libwebp, arr, q)


# ---------------------------------------------------------------------------
# Live interop — advanced API (forces simple filter, sharpness,
# multi-partition, segment spreads). ABI 0x020f == libwebp 1.2.x.
# ---------------------------------------------------------------------------

_ABI = 0x020F


class _WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int),
        ("preprocessing", ctypes.c_int), ("partitions", ctypes.c_int),
        ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int),
        ("thread_level", ctypes.c_int), ("low_memory", ctypes.c_int),
        ("near_lossless", ctypes.c_int), ("exact", ctypes.c_int),
        ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int),
        ("qmin", ctypes.c_int), ("qmax", ctypes.c_int),
    ]


class _WebPMemoryWriter(ctypes.Structure):
    _fields_ = [
        ("mem", ctypes.c_void_p), ("size", ctypes.c_size_t),
        ("max_size", ctypes.c_size_t), ("pad", ctypes.c_uint32),
    ]


class _WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
        ("v", ctypes.c_void_p), ("y_stride", ctypes.c_int),
        ("uv_stride", ctypes.c_int), ("a", ctypes.c_void_p),
        ("a_stride", ctypes.c_int), ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3), ("writer", ctypes.c_void_p),
        ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.c_void_p), ("stats", ctypes.c_void_p),
        ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p), ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8), ("memory_", ctypes.c_void_p),
        ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


def _encode_advanced(lib, arr: np.ndarray, quality: float, **kw) -> bytes:
    h, w, _ = arr.shape
    cfg = _WebPConfig()
    assert lib.WebPConfigInitInternal(
        ctypes.byref(cfg), 0, ctypes.c_float(quality), _ABI
    ), "WebPConfig ABI mismatch"
    for k, v in kw.items():
        setattr(cfg, k, v)
    assert lib.WebPValidateConfig(ctypes.byref(cfg))
    pic = _WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), _ABI)
    pic.width, pic.height = w, h
    pic.use_argb = 0
    buf = np.ascontiguousarray(arr, np.uint8)
    assert lib.WebPPictureImportRGBA(
        ctypes.byref(pic),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w * 4
    )
    mw = _WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(mw))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(mw), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    lib.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"advanced encode failed: {pic.error_code}"
    data = ctypes.string_at(mw.mem, mw.size)
    lib.WebPMemoryWriterClear(ctypes.byref(mw))
    return data


def test_interop_advanced_paths(libwebp):
    lib = libwebp.lib
    rng = np.random.default_rng(9)
    y, x = np.mgrid[0:160, 0:240]
    arr = np.dstack(
        [np.clip(128 + 80 * np.sin(x / 17.0)
                 + rng.normal(0, 20, (160, 240)), 0, 255),
         np.clip(255 - (y * 2) % 256, 0, 255), (x * y // 64) % 256,
         np.full((160, 240), 255)]
    ).astype(np.uint8)
    cases = [
        # The SIMPLE loop filter (bitstream filter_type=1).
        dict(filter_type=0, filter_strength=40, autofilter=0),
        dict(quality=20.0, filter_type=0),
        dict(filter_type=0, filter_sharpness=4),
        # Nonzero sharpness with the normal filter.
        dict(filter_sharpness=3),
        dict(filter_sharpness=7),
        # Multiple token partitions (rows round-robin readers).
        dict(partitions=1, method=0),
        # Segment spreads under strong SNS; max strength.
        dict(segments=4, sns_strength=100),
        dict(filter_strength=100),
        dict(quality=30.0, segments=4, sns_strength=80, filter_type=0,
             filter_sharpness=6, autofilter=1),
    ]
    for kw in cases:
        quality = kw.pop("quality", 75.0)
        data = _encode_advanced(lib, arr, quality, **kw)
        ry, ru, rv = libwebp.decode_yuv(data)
        my, mu, mv = decode_vp8(_vp8_chunk(data))
        assert np.array_equal(my, ry), kw
        assert np.array_equal(mu, ru), kw
        assert np.array_equal(mv, rv), kw


# ---------------------------------------------------------------------------
# ALPH alpha-plane decode (lossy frame + lossless alpha → RGBA).
# ---------------------------------------------------------------------------


def _decode_rgba_ref(libwebp, data: bytes) -> np.ndarray:
    lib = libwebp.lib
    lib.WebPDecodeRGBA.restype = ctypes.c_void_p
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                           ctypes.byref(h))
    assert p, "libwebp RGBA decode failed"
    try:
        raw = ctypes.string_at(p, w.value * h.value * 4)
    finally:
        lib.WebPFree(p)
    return np.frombuffer(raw, np.uint8).reshape(h.value, w.value, 4).copy()


def test_interop_alpha_plane(libwebp):
    """The ALPH chunk's alpha plane is LOSSLESS: our decoded channel
    must equal libwebp's RGBA alpha bit-exactly (and hence the source
    alpha). Content classes drive different row filters."""
    rng = np.random.default_rng(3)
    planes = {
        "smooth": lambda h, w: np.clip(
            100 + 80 * np.sin(np.mgrid[0:h, 0:w][1] / 7.0)
            + rng.integers(0, 30, (h, w)), 0, 255),
        "noise": lambda h, w: rng.integers(1, 256, (h, w)),
        "binary": lambda h, w: (np.mgrid[0:h, 0:w][0] % 8 < 4) * 255,
    }
    for mk in planes.values():
        for (h, w) in [(48, 64), (33, 47)]:
            y, x = np.mgrid[0:h, 0:w]
            arr = np.dstack(
                [(x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256,
                 mk(h, w)]
            ).astype(np.uint8)
            data = libwebp.encode(arr, 80)
            ref = _decode_rgba_ref(libwebp, data)
            mine = decode_webp(data)
            assert mine.shape[2] == 4
            assert np.array_equal(mine[:, :, 3], ref[:, :, 3])
            assert np.array_equal(mine[:, :, 3], arr[:, :, 3])


def test_interop_alpha_raw_and_filter_modes(libwebp):
    """Advanced API: alpha_compression=0 forces the RAW ALPH path;
    alpha_filtering 0/2 steer the row-filter choice."""
    rng = np.random.default_rng(13)
    y, x = np.mgrid[0:40, 0:56]
    arr = np.dstack(
        [(x * 3) % 256, (y * 7) % 256, (x + y) % 256,
         np.clip(60 + x * 2 + rng.integers(0, 40, (40, 56)), 0, 255)]
    ).astype(np.uint8)
    for kw in (dict(alpha_compression=0), dict(alpha_filtering=0),
               dict(alpha_filtering=2)):
        data = _encode_advanced(libwebp.lib, arr, 75.0, **kw)
        ref = _decode_rgba_ref(libwebp, data)
        mine = decode_webp(data)
        assert mine.shape[2] == 4, kw
        assert np.array_equal(mine[:, :, 3], ref[:, :, 3]), kw


def test_interop_randomized_sweep(libwebp):
    """Seeded randomized conformance: random geometry x content mix x
    quality per case, bit-exact YUV each time. The fixed batteries
    above pin known hard cases; this keeps exploring new ones on every
    suite run (deterministically, so failures reproduce)."""
    rng = np.random.default_rng(20260815)
    for case in range(12):
        h = int(rng.integers(1, 120))
        w = int(rng.integers(1, 120))
        y, x = np.mgrid[0:h, 0:w]
        base = (
            rng.integers(0, 256) + x * int(rng.integers(0, 7))
            + y * int(rng.integers(0, 7))
        ) % 256
        noise = rng.integers(0, int(rng.integers(2, 128)), (h, w))
        arr = np.dstack([
            np.clip(base + noise, 0, 255),
            np.clip(base[::-1] + noise, 0, 255),
            (x * y + case) % 256,
            np.full((h, w), 255),
        ]).astype(np.uint8)
        q = float(rng.integers(5, 101))
        _assert_conforms(libwebp, arr, q)
