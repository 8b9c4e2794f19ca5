"""HEIF/AVIF metadata conformance against the system libheif
(`libheif.so.1`, with x265 HEVC and aom AV1 encoder plugins): every
property our `heif_info` (ops/mp4box.py) reports on libheif-ENCODED
files must agree with libheif's own handle API — dimensions, alpha
presence, and luma bit depth — plus the container facts libheif
implies (brand family, codec, grid-derived primary payload).

The coded AV1/HEVC pixel data stays the documented decode boundary;
this anchors the METADATA-FIRST surface a crawl pipeline prunes on.

Sections: known-answer checks over the committed conformance streams
(mp4box.HEIF_CONFORMANCE_STREAMS — hold with no library), then live
encode-and-compare across formats, alpha, odd geometries, and
rotation via the ctypes harness (heif_error is returned BY VALUE, so
its struct is declared for restype).
"""

from __future__ import annotations

import base64
import ctypes as C
import ctypes.util
import os

import numpy as np
import pytest

from sqlpp_spark.ops.mp4box import (
    HEIF_CONFORMANCE_STREAMS,
    Mp4BoxError,
    heif_info,
)

EXPECTED = {
    "avif_rgb": dict(format="avif", width=62, height=46, bit_depth=8,
                     rotation=0, has_alpha=False, codec="av01",
                     n_items=1, primary_item_bytes=103),
    "avif_alpha": dict(format="avif", width=62, height=46, bit_depth=8,
                       rotation=0, has_alpha=True, codec="av01",
                       n_items=2, primary_item_bytes=103),
    "heic_rgb": dict(format="heic", width=62, height=46, bit_depth=8,
                     rotation=0, has_alpha=False, codec="hevc",
                     n_items=2, primary_item_bytes=224),
    "heic_alpha": dict(format="heic", width=62, height=46, bit_depth=8,
                       rotation=0, has_alpha=True, codec="hevc",
                       n_items=4, primary_item_bytes=224),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_heif_known_answer_vectors(name):
    data = base64.b64decode(HEIF_CONFORMANCE_STREAMS[name])
    info = heif_info(data)
    for k, v in EXPECTED[name].items():
        assert info[k] == v, (name, k, info[k], v)


def test_heif_malformed_contract():
    data = base64.b64decode(HEIF_CONFORMANCE_STREAMS["avif_rgb"])
    for bad in (b"", b"\x00" * 16, data[:11], data[:40]):
        try:
            heif_info(bad)
        except Mp4BoxError:
            pass
    # byte flips must stay inside the module-error contract
    for pos in range(4, min(len(data), 200), 7):
        mutated = bytearray(data)
        mutated[pos] ^= 0x5A
        try:
            heif_info(bytes(mutated))
        except Mp4BoxError:
            pass


# ---------------------------------------------------------------------------
# Live harness.
# ---------------------------------------------------------------------------


class _HeifError(C.Structure):
    _fields_ = [("code", C.c_int), ("subcode", C.c_int),
                ("message", C.c_char_p)]


_COLORSPACE_RGB = 1
_CHROMA_RGB = 10
_CHROMA_RGBA = 11
_CHANNEL_INTERLEAVED = 10
_COMP_HEVC = 1
_COMP_AV1 = 4


class _LibHeif:
    def __init__(self, lib: C.CDLL) -> None:
        lib.heif_context_alloc.restype = C.c_void_p
        lib.heif_context_free.argtypes = [C.c_void_p]
        for fn, args in [
            ("heif_context_read_from_memory_without_copy",
             [C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p]),
            ("heif_context_get_primary_image_handle",
             [C.c_void_p, C.POINTER(C.c_void_p)]),
            ("heif_image_create",
             [C.c_int, C.c_int, C.c_int, C.c_int,
              C.POINTER(C.c_void_p)]),
            ("heif_image_add_plane",
             [C.c_void_p, C.c_int, C.c_int, C.c_int, C.c_int]),
            ("heif_context_get_encoder_for_format",
             [C.c_void_p, C.c_int, C.POINTER(C.c_void_p)]),
            ("heif_encoder_set_lossy_quality", [C.c_void_p, C.c_int]),
            ("heif_context_encode_image",
             [C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
              C.POINTER(C.c_void_p)]),
            ("heif_context_write_to_file", [C.c_void_p, C.c_char_p]),
        ]:
            f = getattr(lib, fn)
            f.restype = _HeifError
            f.argtypes = args
        for fn in ("heif_image_handle_get_width",
                   "heif_image_handle_get_height",
                   "heif_image_handle_has_alpha_channel",
                   "heif_image_handle_get_luma_bits_per_pixel"):
            f = getattr(lib, fn)
            f.restype = C.c_int
            f.argtypes = [C.c_void_p]
        lib.heif_image_get_plane.restype = C.c_void_p
        lib.heif_image_get_plane.argtypes = [C.c_void_p, C.c_int,
                                             C.POINTER(C.c_int)]
        for fn in ("heif_image_handle_release", "heif_encoder_release",
                   "heif_image_release"):
            getattr(lib, fn).argtypes = [C.c_void_p]
        self.lib = lib

    @staticmethod
    def _ok(err: _HeifError, what: str) -> None:
        assert err.code == 0, (
            f"{what}: {err.code}/{err.subcode} "
            f"{err.message.decode() if err.message else ''}"
        )

    def encode(self, arr: np.ndarray, fmt: int, quality: int = 70,
               path: str = "/tmp/heif_interop_tmp.bin") -> bytes:
        lib = self.lib
        h, w, ch = arr.shape
        ctx = lib.heif_context_alloc()
        img = C.c_void_p()
        chroma = _CHROMA_RGBA if ch == 4 else _CHROMA_RGB
        self._ok(lib.heif_image_create(w, h, _COLORSPACE_RGB, chroma,
                                       C.byref(img)), "create")
        self._ok(lib.heif_image_add_plane(
            img, _CHANNEL_INTERLEAVED, w, h, 8), "add_plane")
        stride = C.c_int()
        plane = lib.heif_image_get_plane(img, _CHANNEL_INTERLEAVED,
                                         C.byref(stride))
        assert plane
        buf = np.ascontiguousarray(arr, np.uint8)
        for y in range(h):
            C.memmove(plane + y * stride.value, buf[y].ctypes.data,
                      w * ch)
        enc = C.c_void_p()
        self._ok(lib.heif_context_get_encoder_for_format(
            ctx, fmt, C.byref(enc)), "get_encoder")
        self._ok(lib.heif_encoder_set_lossy_quality(enc, quality),
                 "quality")
        handle = C.c_void_p()
        self._ok(lib.heif_context_encode_image(
            ctx, img, enc, None, C.byref(handle)), "encode")
        self._ok(lib.heif_context_write_to_file(ctx, path.encode()),
                 "write")
        lib.heif_image_handle_release(handle)
        lib.heif_encoder_release(enc)
        lib.heif_image_release(img)
        lib.heif_context_free(ctx)
        with open(path, "rb") as f:
            data = f.read()
        os.unlink(path)
        return data

    def props(self, data: bytes) -> dict:
        lib = self.lib
        ctx = lib.heif_context_alloc()
        self._ok(lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None), "read")
        handle = C.c_void_p()
        self._ok(lib.heif_context_get_primary_image_handle(
            ctx, C.byref(handle)), "primary")
        out = {
            "width": lib.heif_image_handle_get_width(handle),
            "height": lib.heif_image_handle_get_height(handle),
            "has_alpha": bool(
                lib.heif_image_handle_has_alpha_channel(handle)),
            "bit_depth":
                lib.heif_image_handle_get_luma_bits_per_pixel(handle),
        }
        lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)
        return out


@pytest.fixture(scope="module")
def libheif():
    for name in ("libheif.so.1", "libheif.so",
                 ctypes.util.find_library("heif")):
        if not name:
            continue
        try:
            return _LibHeif(C.CDLL(name))
        except OSError:
            continue
    pytest.skip("system libheif not available")


@pytest.mark.parametrize("fmt,codec,family", [
    (_COMP_AV1, "av01", "avif"), (_COMP_HEVC, "hevc", "heic"),
])
def test_interop_heif_properties(libheif, fmt, codec, family):
    rng = np.random.default_rng(5)
    for (h, w) in [(46, 62), (17, 31), (64, 64)]:
        y, x = np.mgrid[0:h, 0:w]
        rgb = np.dstack([(x * 4) % 256, (y * 5) % 256,
                         (x + y) % 256]).astype(np.uint8)
        rgb ^= rng.integers(0, 16, rgb.shape, dtype=np.uint8)
        for arr in (rgb, np.dstack(
                [rgb, np.clip(100 + x, 0, 255)]).astype(np.uint8)):
            data = libheif.encode(arr, fmt)
            ref = libheif.props(data)
            mine = heif_info(data)
            assert mine["format"] == family
            assert mine["codec"] == codec
            assert mine["width"] == ref["width"] == w
            assert mine["height"] == ref["height"] == h
            assert mine["has_alpha"] == ref["has_alpha"] \
                == (arr.shape[2] == 4)
            assert mine["bit_depth"] == ref["bit_depth"] == 8
            assert mine["primary_item_bytes"] > 0
