"""PNG conformance against the system libpng (the jpegarith bar,
round 11): our encoder's output must decode identically under libpng,
and our decoder must recover exact pixels from libpng-encoded streams
— including libpng's adaptive per-row filtering (Sub/Up/Average/
Paeth), which our own encoder never emits (it writes one fixed filter),
so this is the only real exercise of those unfilter paths against an
independent implementation. Also pins our in-house zlib usage against
libpng's, and commits known-answer vectors so the anchor holds with no
C toolchain present.

Layout mirrors tests/test_jpegarith.py: KAT section (toolchain-free),
then a compiled-harness section (skips cleanly without gcc/png.h).
"""

from __future__ import annotations

import base64
import shutil
import subprocess

import numpy as np
import pytest

from sqlpp_spark.ops.imagecodec import (
    decode_png,
    encode_png,
    encode_png_gray,
    encode_png_palette,
)

# ---------------------------------------------------------------------------
# Known-answer vectors: libpng 1.6 (Debian) encodes of closed-form
# arrays. Our decoder must reproduce the arrays bit-exactly.
# ---------------------------------------------------------------------------

KAT_GRAY8 = b'iVBORw0KGgoAAAANSUhEUgAAABcAAAARCAAAAAATGGhhAAAAFUlEQVQYlWNk4MYKmNixg1Fx+ogDAB8WCyRZokD8AAAAAElFTkSuQmCC'
KAT_RGBA8 = b'iVBORw0KGgoAAAANSUhEUgAAAA8AAAAMCAYAAAC9QufkAAAASUlEQVQokZ3LuRWAIBBAwc8hCD4CC7D/Nk1Frl2CCccA3FB2eB4KmC2fbNV+2al0shcb5ENkksPSIscpQT6HhDl1KXJuKPNVeQEcOQ4y9SzsgQAAAABJRU5ErkJggg=='
KAT_RGB16 = b'iVBORw0KGgoAAAANSUhEUgAAAA0AAAAJEAIAAAA2iO1+AAAASUlEQVQoka3MKRbAIAxAwR8SFskN6P0v2YoqBLywmJEjAFDljgbt/UuRcw2ergvhxEGnuue0M1vV0cXo192l5HGxy3nuVlfKyA8HHAydmTJ2mAAAAABJRU5ErkJggg=='


def _kat_img(name):
    if name == "gray8":
        y, x = np.mgrid[0:17, 0:23]
        return ((x * 11 + y * 7) % 256).astype(np.uint8)
    if name == "rgba8":
        y, x = np.mgrid[0:12, 0:15]
        return np.dstack(
            [(x * 17) % 256, (y * 29) % 256, (x * y) % 256,
             ((x + y) * 13) % 256]
        ).astype(np.uint8)
    y, x = np.mgrid[0:9, 0:13]
    return np.dstack(
        [(x * 4097) % 65536, (y * 8191) % 65536, (x * y * 257) % 65536]
    ).astype(np.uint16)


@pytest.mark.parametrize(
    "name,b64", [("gray8", KAT_GRAY8), ("rgba8", KAT_RGBA8),
                 ("rgb16", KAT_RGB16)]
)
def test_libpng_known_answer_vectors(name, b64):
    img = _kat_img(name)
    got = decode_png(base64.b64decode(b64))
    assert np.array_equal(got.squeeze(), img.squeeze()), name


# ---------------------------------------------------------------------------
# Compiled libpng harness (skip without toolchain)
# ---------------------------------------------------------------------------

_HARNESS_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>
static int do_decode(const char*in,const char*out){
  FILE*f=fopen(in,"rb"); if(!f)return 2;
  png_structp p=png_create_read_struct(PNG_LIBPNG_VER_STRING,NULL,NULL,NULL);
  png_infop i=png_create_info_struct(p);
  if(setjmp(png_jmpbuf(p)))return 3;
  png_init_io(p,f);
  png_read_png(p,i,PNG_TRANSFORM_EXPAND,NULL);
  png_uint_32 w=png_get_image_width(p,i),h=png_get_image_height(p,i);
  int d=png_get_bit_depth(p,i),c=png_get_channels(p,i);
  png_bytepp rows=png_get_rows(p,i);
  size_t rb=png_get_rowbytes(p,i);
  FILE*o=fopen(out,"wb");
  fprintf(o,"%u %u %d %d\n",w,h,c,d);
  for(png_uint_32 y=0;y<h;y++) fwrite(rows[y],1,rb,o);
  fclose(o); png_destroy_read_struct(&p,&i,NULL); fclose(f); return 0;
}
static int do_encode(const char*in,int w,int h,int c,int d,const char*out){
  FILE*f=fopen(in,"rb"); if(!f)return 2;
  size_t rb=(size_t)w*c*d/8;
  png_bytep buf=malloc(rb*h);
  if(fread(buf,1,rb*h,f)!=rb*h)return 2;
  fclose(f);
  png_structp p=png_create_write_struct(PNG_LIBPNG_VER_STRING,NULL,NULL,NULL);
  png_infop i=png_create_info_struct(p);
  if(setjmp(png_jmpbuf(p)))return 3;
  FILE*o=fopen(out,"wb"); png_init_io(p,o);
  int ct = c==1?PNG_COLOR_TYPE_GRAY: c==2?PNG_COLOR_TYPE_GRAY_ALPHA:
           c==3?PNG_COLOR_TYPE_RGB:PNG_COLOR_TYPE_RGB_ALPHA;
  png_set_IHDR(p,i,w,h,d,ct,PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT,PNG_FILTER_TYPE_DEFAULT);
  png_set_filter(p,0,PNG_ALL_FILTERS);
  png_bytepp rows=malloc(sizeof(png_bytep)*h);
  for(int y=0;y<h;y++) rows[y]=buf+(size_t)y*rb;
  png_set_rows(p,i,rows);
  png_write_png(p,i,PNG_TRANSFORM_IDENTITY,NULL);
  png_destroy_write_struct(&p,&i); fclose(o); return 0;
}
int main(int argc,char**argv){
  if(argc>=4&&!strcmp(argv[1],"decode")) return do_decode(argv[2],argv[3]);
  if(argc>=8&&!strcmp(argv[1],"encode")) return do_encode(argv[2],atoi(argv[3]),atoi(argv[4]),atoi(argv[5]),atoi(argv[6]),argv[7]);
  return 1;
}
"""


@pytest.fixture(scope="module")
def libpng_harness(tmp_path_factory):
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler")
    d = tmp_path_factory.mktemp("pngio")
    src = d / "pngio.c"
    src.write_text(_HARNESS_C)
    exe = d / "pngio"
    r = subprocess.run(
        [gcc, "-O2", "-o", str(exe), str(src), "-lpng"], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"cannot build libpng harness: {r.stderr[:200]!r}")
    return exe, d


def _lib_decode(exe, d, data):
    (d / "in.png").write_bytes(data)
    r = subprocess.run(
        [str(exe), "decode", str(d / "in.png"), str(d / "out.raw")],
        capture_output=True,
    )
    assert r.returncode == 0, "libpng failed to decode the stream"
    hdr, raw = (d / "out.raw").read_bytes().split(b"\n", 1)
    w, h, c, depth = map(int, hdr.split())
    dt = ">u2" if depth == 16 else np.uint8
    arr = np.frombuffer(raw, dtype=dt).reshape(h, w, c)
    return arr.astype(np.uint16 if depth == 16 else np.uint8), depth


def _lib_encode(exe, d, img, depth):
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    raw = (a.astype(">u2") if depth == 16 else a.astype(np.uint8)).tobytes()
    (d / "in.raw").write_bytes(raw)
    r = subprocess.run(
        [str(exe), "encode", str(d / "in.raw"), str(w), str(h), str(c),
         str(depth), str(d / "enc.png")],
        capture_output=True,
    )
    assert r.returncode == 0
    return (d / "enc.png").read_bytes()


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("depth", [8, 16])
def test_interop_libpng_decodes_ours(libpng_harness, ch, depth):
    exe, d = libpng_harness
    rng = np.random.default_rng(ch * depth)
    dt = np.uint8 if depth == 8 else np.uint16
    img = rng.integers(0, 2 ** depth, (13, 17, ch)).astype(dt)
    for ft in (0, 1, 2):
        for il in (False, True):
            out, _ = _lib_decode(
                exe, d, encode_png(img, filter_type=ft, interlace=il)
            )
            assert np.array_equal(out, img), (ch, depth, ft, il)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("depth", [8, 16])
def test_interop_we_decode_libpng(libpng_harness, ch, depth):
    # libpng's adaptive filtering emits Average/Paeth rows our encoder
    # never writes — the cumsum gradient makes those filters win
    exe, d = libpng_harness
    rng = np.random.default_rng(ch + depth)
    dt = np.uint8 if depth == 8 else np.uint16
    img = (
        np.cumsum(rng.integers(0, 7, (21, 33, ch)), axis=1) % (2 ** depth)
    ).astype(dt)
    ours = decode_png(_lib_encode(exe, d, img, depth))
    assert np.array_equal(ours.reshape(img.shape), img), (ch, depth)
    # the libpng stream must actually use a non-trivial filter
    data = _lib_encode(exe, d, img, depth)
    assert len(data) < img.nbytes  # filtered + deflated


def test_interop_palette_and_trns(libpng_harness):
    exe, d = libpng_harness
    rng = np.random.default_rng(7)
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 128, 255], [77, 200, 10]], np.uint8
    )
    img = pal[rng.integers(0, 4, (9, 11))]
    for depth in (1, 2, 4, 8):
        if depth == 1:
            im2 = pal[rng.integers(0, 2, (9, 11))]
        else:
            im2 = img
        out, _ = _lib_decode(exe, d, encode_png_palette(im2, depth=depth))
        assert np.array_equal(out, im2), depth
    # tRNS promotes to RGBA under libpng's EXPAND, matching our own
    # palette-alpha lookup semantics
    trns = np.array([10, 200, 255, 0], np.uint8)
    out, _ = _lib_decode(exe, d, encode_png_palette(img, depth=8, trns=trns))
    colors = np.unique(img.reshape(-1, 3), axis=0)
    amap = {tuple(c): trns[i] for i, c in enumerate(colors)}
    alpha = np.array(
        [[amap[tuple(px)] for px in row] for row in img], np.uint8
    )
    assert np.array_equal(out, np.dstack([img, alpha]))


def test_interop_subbyte_gray(libpng_harness):
    # libpng's EXPAND scales 1/2/4-bit gray to the 8-bit range exactly
    # like our decoder's sample expansion — pin the agreement
    exe, d = libpng_harness
    rng = np.random.default_rng(11)
    for depth in (1, 2, 4):
        g = rng.integers(0, 1 << depth, (7, 9)).astype(np.uint8)
        scale = 255 // ((1 << depth) - 1)
        out, _ = _lib_decode(exe, d, encode_png_gray(g, depth))
        assert np.array_equal(
            out.reshape(7, 9).astype(int), g.astype(int) * scale
        ), depth
        ours = decode_png(encode_png_gray(g, depth))
        assert np.array_equal(ours.squeeze(), out.squeeze()), depth
