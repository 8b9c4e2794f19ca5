"""GIF conformance against the system giflib (`libgif.so.7`, 7.2) —
the same independent-implementation bar as libjpeg-turbo, libpng, and
libwebp: our encoder's streams must decode identically under giflib's
DGifSlurp (LZW decode, palette handling, frame walk), and our decoder
must recover exact pixels from giflib-WRITTEN streams — including
giflib's own LZW code emission and interlaced row ordering, neither
of which a self-round-trip exercises.

Three sections: committed known-answer vectors (giflib 7.2 encodes;
hold with no library), live direction A (ours → giflib), and live
direction B (giflib → ours), all via ctypes — giflib's structs are
declared inline (stable ABI for the 5.x/7.x soname family).
"""

from __future__ import annotations

import base64
import ctypes as C
import ctypes.util
import hashlib

import numpy as np
import pytest

from sqlpp_spark.ops.gifcodec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animated,
)

# ---------------------------------------------------------------------------
# Known-answer vectors: giflib 7.2 encodes of palette images; our
# decoder must reproduce palette[idx] bit-exactly (digest of RGB).
# ---------------------------------------------------------------------------

KAT = {
    "plain16": (
        b'R0lGODdhGwATAPMAAHleTg8a3DLJa3N8ovSaGY3z6KDL9XRvPt8Nc92vuZ5VT+bo'
        b'90iulVFMmYtbHiLhYywAAAAAGwATAAAE/7AwEVwZbOX0BCtKczzDIgiAcx4FURSG'
        b'EiAC8gWPcQDPsQQFgOYCYDwIBoauoVg8GAOFLLAYCRQMQIBwIAAPA8dTcGA4BjvC'
        b'oNZIeBSOxtGWoKYUsMcD4Sg2oAoeDARiBAwMDX0DGAWJCQgHCgAICQciBAgDDZoD'
        b'D38IAAoEogxATw0CBgMBSiQGSZauXi4KXUGmMgsLBggGDTFaKAcBCXAeNQYoOAYL'
        b'IBIIDwEnWUygBE8dPA2GfyG5AFrEMsUDBRZME1cNvYY2BgkOCQOUCG0jQZ5wVBVc'
        b'BQvrQKCESfbvWiUF8xK0ScWsgRwTABIhQBKvwIMFCQw8UGDDhjg3PlgkJQIwgAAB'
        b'ATkAEMhoAY7KBs3eLbLxQUAnUAiqTHDwjgE8TA581MGoIAEhkkocXjMAZNuWCw0C'
        b'6MNUzkARNZneFQCFJmKcAjhKlLEao9GCIlK5MNuzikEEADs=',
        "d94b37edca3cf98411f67566770ad12e", (19, 27, 3)),
    "bw_checker": (
        b'R0lGODdhDQAWAPAAAAAAAP///ywAAAAADQAWAAACFUSMp8nrDZ+MdNqKr858+w5+'
        b'Ykh6BQA7',
        "ffbdb576daafbaffd00ca83e2268de9f", (22, 13, 3)),
    "interlace256": (
        b'R0lGODdhHwARAPcAADNaRgRyMpLfYWF547/MPdP/gGgyg5mQGardShC1qDCTLO8c'
        b'gFzlMUqfmt7/TGloXnw52yP9UKeJrpagzZOEJUt/Q2sX/yHTAMP7WxSTqN4F73Ka'
        b'YwRl7LEnHCK2CGAS682ihunqNsv9ni3mAlVBh7jU6SthMOhjtciaCU+/dYSyDy22'
        b'Q9HSIvgjMssSsWjjwKC3OdHoa8ig0eFk/mZgi7zMYk8XNU7JTZWwc0LGwfveveeN'
        b'0uHDascsS1cFK3YjlGImSey4LOdqHA1ScvWicQ03lKlNaS3iPZ9ti2mmMUVd/1qb'
        b'A2kACRNYsVRaj/LuWy2ktmGOEfb7T4DEh+BJPSEJPzU8RnwG+SCO9w9jSojJ0hqz'
        b'5wYPZKyVsVpeAFs/j3DuyEf6s9On0TJzgN63L0c/QNf1Gi6eIakG2NPJ7rGwlTKw'
        b'dHpwNtVmz/UWwd2NEKqdrw7wh9wBmO/x6IB1Rlr6LhZsyal5iuvtKIfQAi1h1dzH'
        b'JmN61SHH97uUXd+mNSYSIdTiR8LXK9HWxrOtOeixMyT1/BrzPg4kp1eaq2XH3RHt'
        b'Ver+XUeqlfywA5xLTq/WwTo4lugeC/DiS1NkecChfyxtYDVg/zD2kPKGmELML85s'
        b'8+bT4QJm5OtTl+8IChT9bMaSJA4LA0BtNxjIT5Zko6qp+n2sJTSPGE0wtQMxAAUh'
        b'+BuxN/qEjztbp35oT/Se7h5ctyh7I47FYDoauht1P4TAL+p87YoVmBXgHCR3Vgod'
        b'ryF12I2oDuUCYgYDoH9TBAVyV2aQUUbiVnU0pmg/VRqh3hU+9HhTbhnpNMyGv8o0'
        b'RSV4rDyo0gbbsCUOX8ojF/EUfcLvTrMKOz5PPuSoVe/TymXut98+4XfGrOdF63w3'
        b'DkVTxxXavGEXzfMKLSLFf5UwTSCH3as3sU+YMxB7IJ4wSYMkm1NZfbIqmA2h6EQW'
        b'y5HpWRjI1piCgFUobHTN2YLirAoNNLcHYZVUSBtTuwY3gSpkeY0WnblC4G9trUP8'
        b'GEEMtijmqv+jpHVPRywAAAAAHwARAEAI/wBR/UCx640VLMfK1HHWZsY0fRSaWOv2'
        b'zsenE9+AFMmHK0mpZqKCVSOQLoWDZUhwTavRgBMYOPO20ShE4Q6qXI1I9XAU4oW2'
        b'FqvA6SIRTQ+vQHYiGOkBTgynG24AXJAVhEuNMDvAZCklilOLalKu9NpCqgAbXTnA'
        b'SdDRSUIaSMtIwTEArpQ6UhAyQfl2gFWqEUxEdRORy0kHZP5eOJkGrdcpMVjQhdmE'
        b'RwmLYBBe1DJirVC3bWcsiBv2DoWhSxhKSTPRaQoUch0IdZj35dyCCdruaeBGZIM+'
        b'aJ2ykUKCg44MZZawJOJ2o1aJDpyu/SLgasSKQ/sa90EnBMoDQRusCf+z16BRr3qP'
        b'NE1oMUdVLjsgaOAiwcaRmRUlFKC5VgRJsUWF/MKHFmuQYUYMsKBBRi3XHMPPJo8w'
        b'88kkacjwSC8wIGPBNf3UEg4DS8BgxQDoWLAFAHuIIw4d5NDDwwDE3MNFCtb0UU0g'
        b'iAwzzDZb2LPKJRTUEUoMlvTRix3IPIBNB1wwYk0woTRAjSme/DNDB1NIMMCPh8zR'
        b'TGFNUENFPw0MEA4OdTRB0B3dyGMIDLMoM8gFqZhDDAQ3iBOEFYrE4QMqd5CSiSUf'
        b'tHJIO5IUg00E0YxgyDQfBMBFMNzIwIQKqPShggHm/JIMPy4UkUAvwPjByySwdGAE'
        b'H9fkMA8+GxRwxw0fr0ABRzb+ZMLMFM34EIoZtpQDhy/ORFNPBOqE0IY1NnzSTzbz'
        b'eMHFC0cw8ggfVHwBAxz8LOBDEsYUoMQ35rDBiRIX3MPIBLXMUsIzlRAwiSzttJDB'
        b'Fc7oMcgNliTCRDf4sBMGGFLw8g43ruYQEAA7',
        "6dd8e68557ac385a49b24e3740bba343", (17, 31, 3)),
}


@pytest.mark.parametrize("name", sorted(KAT))
def test_giflib_known_answer_vectors(name):
    b64, digest, shape = KAT[name]
    rgb = decode_gif(base64.b64decode(b64))[:, :, :3]
    assert rgb.shape == shape
    assert hashlib.sha256(rgb.tobytes()).hexdigest()[:32] == digest


# ---------------------------------------------------------------------------
# giflib via ctypes.
# ---------------------------------------------------------------------------

GifWord = C.c_int


class _GifColorType(C.Structure):
    _fields_ = [("Red", C.c_ubyte), ("Green", C.c_ubyte),
                ("Blue", C.c_ubyte)]


class _ColorMapObject(C.Structure):
    _fields_ = [("ColorCount", C.c_int), ("BitsPerPixel", C.c_int),
                ("SortFlag", C.c_bool),
                ("Colors", C.POINTER(_GifColorType))]


class _GifImageDesc(C.Structure):
    _fields_ = [("Left", GifWord), ("Top", GifWord), ("Width", GifWord),
                ("Height", GifWord), ("Interlace", C.c_bool),
                ("ColorMap", C.POINTER(_ColorMapObject))]


class _ExtensionBlock(C.Structure):
    _fields_ = [("ByteCount", C.c_int), ("Bytes", C.POINTER(C.c_ubyte)),
                ("Function", C.c_int)]


class _SavedImage(C.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", C.POINTER(C.c_ubyte)),
                ("ExtensionBlockCount", C.c_int),
                ("ExtensionBlocks", C.POINTER(_ExtensionBlock))]


class _GifFileType(C.Structure):
    _fields_ = [("SWidth", GifWord), ("SHeight", GifWord),
                ("SColorResolution", GifWord),
                ("SBackGroundColor", GifWord),
                ("AspectByte", C.c_ubyte),
                ("SColorMap", C.POINTER(_ColorMapObject)),
                ("ImageCount", C.c_int),
                ("Image", _GifImageDesc),
                ("SavedImages", C.POINTER(_SavedImage)),
                ("ExtensionBlockCount", C.c_int),
                ("ExtensionBlocks", C.POINTER(_ExtensionBlock)),
                ("Error", C.c_int),
                ("UserData", C.c_void_p),
                ("Private", C.c_void_p)]


_INPUT_FUNC = C.CFUNCTYPE(C.c_int, C.POINTER(_GifFileType),
                          C.POINTER(C.c_ubyte), C.c_int)
_OUTPUT_FUNC = C.CFUNCTYPE(C.c_int, C.POINTER(_GifFileType),
                           C.POINTER(C.c_ubyte), C.c_int)

_INTERLACE_OFFSETS = ((0, 8), (4, 8), (2, 4), (1, 2))


class _GifLib:
    def __init__(self, lib: C.CDLL) -> None:
        lib.DGifOpen.restype = C.POINTER(_GifFileType)
        lib.DGifOpen.argtypes = [C.c_void_p, _INPUT_FUNC,
                                 C.POINTER(C.c_int)]
        lib.DGifSlurp.argtypes = [C.POINTER(_GifFileType)]
        lib.DGifCloseFile.argtypes = [C.POINTER(_GifFileType),
                                      C.POINTER(C.c_int)]
        lib.EGifOpen.restype = C.POINTER(_GifFileType)
        lib.EGifOpen.argtypes = [C.c_void_p, _OUTPUT_FUNC,
                                 C.POINTER(C.c_int)]
        lib.GifMakeMapObject.restype = C.POINTER(_ColorMapObject)
        lib.GifMakeMapObject.argtypes = [C.c_int,
                                         C.POINTER(_GifColorType)]
        lib.GifFreeMapObject.argtypes = [C.POINTER(_ColorMapObject)]
        lib.EGifPutScreenDesc.argtypes = [
            C.POINTER(_GifFileType), C.c_int, C.c_int, C.c_int, C.c_int,
            C.POINTER(_ColorMapObject)]
        lib.EGifPutImageDesc.argtypes = [
            C.POINTER(_GifFileType), C.c_int, C.c_int, C.c_int, C.c_int,
            C.c_bool, C.POINTER(_ColorMapObject)]
        lib.EGifPutLine.argtypes = [C.POINTER(_GifFileType),
                                    C.POINTER(C.c_ubyte), C.c_int]
        lib.EGifCloseFile.argtypes = [C.POINTER(_GifFileType),
                                      C.POINTER(C.c_int)]
        self.lib = lib

    def slurp(self, data: bytes):
        """(sw, sh, frames); frame = (left, top, idx_2d, palette)."""
        state = {"pos": 0}

        @_INPUT_FUNC
        def read_cb(gif, buf, count):
            pos = state["pos"]
            chunk = data[pos:pos + count]
            C.memmove(buf, chunk, len(chunk))
            state["pos"] = pos + len(chunk)
            return len(chunk)

        err = C.c_int(0)
        gf = self.lib.DGifOpen(None, read_cb, C.byref(err))
        assert gf, f"DGifOpen failed: {err.value}"
        assert self.lib.DGifSlurp(gf) == 1, \
            f"DGifSlurp failed: {gf.contents.Error}"
        g = gf.contents
        sw, sh = g.SWidth, g.SHeight

        def cmap_to_pal(ptr):
            if not ptr:
                return None
            cm = ptr.contents
            arr = np.ctypeslib.as_array(
                cm.Colors, shape=(cm.ColorCount,))
            return np.stack(
                [arr["Red"], arr["Green"], arr["Blue"]], axis=-1
            ).astype(np.uint8)

        global_pal = cmap_to_pal(g.SColorMap)
        frames = []
        for fi in range(g.ImageCount):
            si = g.SavedImages[fi]
            d = si.ImageDesc
            idx = np.ctypeslib.as_array(
                si.RasterBits, shape=(d.Height, d.Width)).copy()
            pal = cmap_to_pal(d.ColorMap)
            frames.append(
                (d.Left, d.Top, idx,
                 global_pal if pal is None else pal)
            )
        err2 = C.c_int(0)
        self.lib.DGifCloseFile(gf, C.byref(err2))
        return sw, sh, frames

    def encode(self, indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
        h, w = indices.shape
        out = bytearray()

        @_OUTPUT_FUNC
        def write_cb(gif, buf, count):
            out.extend(C.string_at(buf, count))
            return count

        n = len(palette)
        size = 2
        while size < n:
            size *= 2
        colors = (_GifColorType * size)()
        for i in range(size):
            r, g, b = palette[min(i, n - 1)]
            colors[i] = _GifColorType(int(r), int(g), int(b))
        cmap = self.lib.GifMakeMapObject(size, colors)
        assert cmap
        err = C.c_int(0)
        gf = self.lib.EGifOpen(None, write_cb, C.byref(err))
        assert gf, f"EGifOpen failed: {err.value}"
        assert self.lib.EGifPutScreenDesc(gf, w, h, 8, 0, cmap) == 1
        assert self.lib.EGifPutImageDesc(
            gf, 0, 0, w, h, interlace, None) == 1
        rows = range(h)
        if interlace:
            rows = [y for start, step in _INTERLACE_OFFSETS
                    for y in range(start, h, step)]
        for y in rows:
            row = np.ascontiguousarray(indices[y], np.uint8)
            assert self.lib.EGifPutLine(
                gf, row.ctypes.data_as(C.POINTER(C.c_ubyte)), w) == 1
        err2 = C.c_int(0)
        assert self.lib.EGifCloseFile(gf, C.byref(err2)) == 1
        self.lib.GifFreeMapObject(cmap)
        return bytes(out)


@pytest.fixture(scope="module")
def giflib():
    for name in ("libgif.so.7", "libgif.so",
                 ctypes.util.find_library("gif")):
        if not name:
            continue
        try:
            return _GifLib(C.CDLL(name))
        except OSError:
            continue
    pytest.skip("system giflib not available")


def test_interop_giflib_decodes_ours(giflib):
    rng = np.random.default_rng(5)
    for n_colors in (2, 5, 16, 200):
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        pal = np.unique(pal, axis=0)
        rgb = pal[rng.integers(0, len(pal), (23, 31))]
        for interlace in (False, True):
            data = encode_gif(rgb, interlace=interlace)
            sw, sh, frames = giflib.slurp(data)
            assert (sw, sh) == (31, 23)
            _, _, idx, gpal = frames[0]
            assert np.array_equal(gpal[idx], rgb), (n_colors, interlace)


def test_interop_giflib_decodes_our_animation(giflib):
    rng = np.random.default_rng(6)
    pal = np.unique(
        rng.integers(0, 256, (12, 3), dtype=np.uint8), axis=0)
    frames = [pal[rng.integers(0, len(pal), (18, 25))] for _ in range(4)]
    data = encode_gif_animated(frames, delay_cs=7)
    sw, sh, got = giflib.slurp(data)
    assert (sw, sh) == (25, 18) and len(got) == 4
    for src, (_, _, idx, gpal) in zip(frames, got):
        assert np.array_equal(gpal[idx], src)


def test_interop_we_decode_giflib(giflib):
    rng = np.random.default_rng(7)
    for n_colors in (2, 4, 16, 256):
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, (29, 37)).astype(np.uint8)
        for interlace in (False, True):
            data = giflib.encode(idx, pal, interlace=interlace)
            mine = decode_gif(data)
            assert np.array_equal(mine[:, :, :3], pal[idx]), \
                (n_colors, interlace)


def test_interop_we_decode_giflib_roundtrips_frames(giflib):
    """giflib stream → our frame decoder → re-encode → giflib slurp:
    the full loop stays pixel-exact."""
    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, (16, 21)).astype(np.uint8)
    data = giflib.encode(idx, pal)
    frames = decode_gif_frames(data)
    assert len(frames) == 1
    rgb = np.asarray(frames[0][0] if isinstance(frames[0], tuple)
                     else frames[0])[:, :, :3]
    data2 = encode_gif(rgb)
    _, _, got = giflib.slurp(data2)
    _, _, gidx, gpal = got[0]
    assert np.array_equal(gpal[gidx], pal[idx])
