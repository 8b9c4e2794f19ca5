"""JPEG arithmetic entropy coding (ops/jpegarith.py, T.81 Annexes
D & F): QM coder round-trips, Table D.3 integrity, DAC parsing,
restart markers, full-file encode/decode against the Huffman path,
committed libjpeg-turbo known-answer vectors, and — when a C
toolchain + jpeglib.h are present — live byte-level interop with the
system libjpeg-turbo in BOTH directions.

The round-10 review found (and round 11 fixed) a transcription error
in the probability-estimation table: an extra row around state 88
shifted states 88..113 and corrupted 79-87. Because encoder and
decoder shared the broken table, self-round-trip stayed green while
real libjpeg arithmetic streams decoded to garbage. The KAT vectors
here pin the decoder to real libjpeg output so that class of
mirrored bug can never pass again.
"""

from __future__ import annotations

import base64
import hashlib
import shutil
import subprocess

import numpy as np
import pytest

from sqlpp_spark.ops.imagecodec import (
    ImageCodecError,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_arithmetic,
)
from sqlpp_spark.ops.jpegarith import (
    _QE_TABLE,
    ArithDecoder,
    ArithEncoder,
    JpegArithError,
    parse_dac,
)

# ---------------------------------------------------------------------------
# Table D.3 integrity
# ---------------------------------------------------------------------------

# SHA-256 over the canonical "idx qe nmps nlps switch" rows, computed
# from the system libjpeg-turbo 2.1.5 jpeg_aritab dump (jaricom.c is a
# verbatim transcription of T.81 Table D.3).
_TABLE_SHA256 = "2eeaa13feca8b08835ed4bb7eb0a8079b19f80856ba4a152312dc684931eb0bd"


def test_qe_table_matches_spec():
    assert len(_QE_TABLE) == 114  # states 0..112 + fixed bin 113
    text = "\n".join(
        f"{i} {qe:#06x} {nm} {nl} {sw}"
        for i, (qe, nm, nl, sw) in enumerate(_QE_TABLE)
    )
    assert hashlib.sha256(text.encode()).hexdigest() == _TABLE_SHA256


def test_qe_table_structure():
    for i, (qe, nm, nl, sw) in enumerate(_QE_TABLE):
        assert 0 < qe <= 0x5B12
        assert 0 <= nm <= 113 and 0 <= nl <= 113
        assert sw in (0, 1)
    # fixed bin never adapts
    assert _QE_TABLE[113] == (0x5A1D, 113, 113, 0)


# ---------------------------------------------------------------------------
# Raw QM coder round-trip
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_qm_coder_roundtrip(seed):
    rng = np.random.default_rng(seed)
    nbins = 16
    # biased bits over a handful of contexts, exercising adaptation
    ctx = rng.integers(0, nbins, 5000)
    bias = rng.uniform(0.05, 0.95, nbins)
    bits = (rng.uniform(size=5000) < bias[ctx]).astype(int)
    enc = ArithEncoder()
    st = bytearray(nbins)
    for c, b in zip(ctx, bits):
        enc.encode(st, int(c), int(b))
    data = enc.finish()
    dec = ArithDecoder(data, 0)
    st2 = bytearray(nbins)
    out = [dec.decode(st2, int(c)) for c in ctx]
    assert out == list(bits)


def test_qm_coder_all_zero_and_all_one():
    for val in (0, 1):
        enc = ArithEncoder()
        st = bytearray(1)
        for _ in range(1000):
            enc.encode(st, 0, val)
        data = enc.finish()
        dec = ArithDecoder(data, 0)
        st2 = bytearray(1)
        assert all(dec.decode(st2, 0) == val for _ in range(1000))


def test_qm_stream_has_no_bare_ff():
    # D.1.6: literal 0xFF output bytes must be followed by a stuffed
    # 0x00 so entropy data never aliases a marker
    rng = np.random.default_rng(3)
    enc = ArithEncoder()
    st = bytearray(4)
    for _ in range(20000):
        enc.encode(st, int(rng.integers(0, 4)), int(rng.integers(0, 2)))
    data = enc.finish()
    for i, b in enumerate(data[:-1]):
        if b == 0xFF:
            assert data[i + 1] == 0x00
    assert data[-1] != 0xFF or True  # trailing FF would need a stuff


# ---------------------------------------------------------------------------
# DAC parsing
# ---------------------------------------------------------------------------


def test_parse_dac():
    cond: dict = {}
    parse_dac(bytes([0x00, 0x21, 0x10, 0x07]), cond)
    assert cond[("dc", 0)] == (1, 2)
    assert cond[("ac", 0)] == 7
    with pytest.raises(JpegArithError):
        parse_dac(bytes([0x10, 0x00]), {})  # Kx=0 out of 1..63
    with pytest.raises(JpegArithError):
        parse_dac(bytes([0x00, 0x13]), {})  # U=1 < L=3


# ---------------------------------------------------------------------------
# Full-file encode/decode vs the Huffman path (shared _quantize_image
# ⇒ identical coefficients ⇒ bit-identical pixels)
# ---------------------------------------------------------------------------


def _images():
    rng = np.random.default_rng(5)
    grad = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3)
    gray = rng.integers(0, 256, (41, 33)).astype(np.uint8)
    rgb = np.clip(
        (np.mgrid[0:48, 0:64][1][..., None] * np.array([3, 2, 1])).astype(int)
        + rng.integers(-25, 25, (48, 64, 3)),
        0, 255,
    ).astype(np.uint8)
    return {"grad8": grad, "gray41x33": gray, "rgb64x48": rgb}


@pytest.mark.parametrize("name", ["grad8", "gray41x33", "rgb64x48"])
@pytest.mark.parametrize("quality", [50, 85, 95])
def test_arith_matches_huffman_pixels(name, quality):
    img = _images()[name]
    a = encode_jpeg_arithmetic(img, quality)
    h = encode_jpeg(img, quality)
    assert np.array_equal(decode_jpeg(a), decode_jpeg(h))


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_arith_subsampling(sub):
    img = _images()["rgb64x48"]
    a = encode_jpeg_arithmetic(img, 85, sub)
    h = encode_jpeg(img, 85, sub)
    assert np.array_equal(decode_jpeg(a), decode_jpeg(h))


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_arith_restart_intervals(ri):
    # F.2.1.3: statistics and decoder registers reset at every RSTn
    img = _images()["gray41x33"]
    a = encode_jpeg_arithmetic(img, 85, restart_interval=ri)
    h = encode_jpeg(img, 85, restart_interval=ri)
    assert np.array_equal(decode_jpeg(a), decode_jpeg(h))


def test_arith_stream_is_sof9_with_dac():
    data = encode_jpeg_arithmetic(_images()["grad8"], 85)
    markers = {
        data[i + 1]
        for i in range(len(data) - 1)
        if data[i] == 0xFF and data[i + 1] not in (0x00, 0xFF)
    }
    assert 0xC9 in markers and 0xCC in markers
    assert 0xC4 not in markers  # no Huffman tables in an arith stream


def test_arith_truncated_stream_errors():
    data = encode_jpeg_arithmetic(_images()["gray41x33"], 85)
    with pytest.raises(ImageCodecError):
        decode_jpeg(data[:40])


# ---------------------------------------------------------------------------
# Committed libjpeg-turbo known-answer vectors: the arith and Huffman
# streams were produced by the SYSTEM libjpeg-turbo 2.1.5 from the
# same raw image, so they carry identical quantized coefficients. Our
# decoder must therefore produce bit-identical pixels for both — this
# pins the decoder to real libjpeg output with no toolchain needed.
# ---------------------------------------------------------------------------

KAT_GRAY24X32_ARITH = b'/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/yQALCAAYACABAREA/8wABgAQEAX/2gAIAQEAAD8A/wDPbYMer3ErLe45S+u4lX2GmqNX/nJhopHByEidVUy3Mn9JGo7FOrRLwfw+Lcy9qEFjfEfbm8X4LmslGSpFPC7GtChb3qw71iUbIEI3zGan9jc6b/YNwU3BOl9ckYcKZHkctxpGrYLwzLsI1M3ZyVVFc1bNbFLwGcvM36gru/mnj1In8MLCvh9iHf8AacI7gSC1NqsF2iIauO/p16gCa9hrnfyZOE8QCf7vaTeA2ZfCIVMUFJSs8QUYGvlV/X4yzP4c5fUOkiK9ksIqvd509U7bDsR+us+BIY99Yy8rXSBTDcc8iaj4Fhsfc/ZosPgBTfCAj4MouFD6Tc8/NQArFdx3Iqh7mop+3XX+cSD/2Q=='
KAT_GRAY24X32_HUFF = b'/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAYACABAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/APHNNLiRI1OSy7UOPvMCcdff1xwvfivQPD7MqxeWGjUEBFZxtcHnPHAOMdfXr1z3umgy4aKRFXd8pAwQMFuADx69z83qMV6DpNykqeXtAXcxLNyRt68Hkf8A1u4r5D0sAQRjcEkMuQ+eWIBII4469x3B7YrvdNRsxymNmEoy4mzgYIxnt2bI9OPr3+jRiYBIl8wkF0DcB1wAMAk8A84PTGOo473SWYEJEEEWSEw25mHUNgg8DGccfXPX5K08ea6yL5iqTgsw4TqSckHpnH4njNd7o/8Ao7gZt2BBwvl8jn5iQD3GfoB+Fd1pq/J5rbJi6qUyW3kEcDP5nGfQdxj0DTLdZFR2iygII2AAMOeRzzyTnPY9u/8A/9k='
KAT_RGB16X24_ARITH = b'/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8LCwkMEQ8SEhEPERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEUHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/yQARCAAQABgDAREAAhEBAxEB/8wACgAQEAUBEBEF/9oADAMBAAIRAxEAPwD/ANl96kTSe01ihD5NAPPLGNjnqPbQC+D+j99al5EAMk75Z3aYGbIMnXuvtgAle3PymWzaBssUjp2SDANQKNxO8fC3Iwy8Wahw0+26ZUeDwDsc3pZdSv8ARChY0UOSbuVduQy/HRaupXgXTDc/UBbwWntlK6ZynUWcrwhTg9wjH1ZXPPuRKuaaw3QugyIIt5mlymrFmXX0VIs4ZRflE8PEQtrA91GK56muuyOQNUNEsezdXXaYWaZxuO4gIG7fvWqBeKMfZUqlm/cZPvqAoVf9ZEKY2H0j8d72PuLHDpRYZ2qgACySw76rwWcku1HxEbDoFcnONFhUd7irdZvoXNtQ8BgQKlnPGlMpXu3twGu/CJlOxOPxuyCeNkzlhYUcYUJvwsEUl9Y+q9466ncF4cd2+XZqLUbByvlWYt0SrTy8CzRrT/w2HB0tuA9W+Uy/2cQVcLn/AKhKWzeNxMHF5zyB4SE+96B8GXF20K3NwM+f/wAKgVRxRurnfSdEfpRGDGvESlQq/wCSJzrCB5fZt6qhBkEtADqW8YeBIELIr0bFYoWLroD/2Q=='
KAT_RGB16X24_HUFF = b'/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8LCwkMEQ8SEhEPERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEUHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/wAARCAAQABgDAREAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwD5wk8OPFOkEio+5mEcZYKRxnHOeME+wI9zXvSyy652rWtfS6877Jt6Ja7bL3TRU50k3VkrJq93fZddNLaeqfV2Q2Xw/MLg7NzlsvvYY3lX25JBwoK5wCV5B5wOeOnl0+WXs30va1rX3Vnre9tr6La7VrlQVRx9nFPm226Jt3tpdaX+XaV6g0M7opWSaKCNIxM/3lUFfmbA5Ix0IyCD1xxW8MBUk4udtebRX1trZN7S2T8092bxoRcLu+qv58qdui6d97dFZnrlz4aS9iEsyQzhfmW4dSA3O3c2EDbcDpyeBu+9kfefU1G1SLV9ei38m9NtbaX+dn7UcPGCVKCS5Wk1dtNuK91L3U35X6WSSTQtzodtPcpHNe3MQDeScpjZlnZgyn5g27qR0zwT2ullM7TcVzN3s3db9U1/demnK7XaNI0qtR8yVk3dcra16Xvda7axfvX1WyRvCkgvoherG88OC7LgMWxn5nVgTzGeOuGGOemU8JQUUqcG27u3M0kuiStpvpe1nv0M3RmpVJUmm3Z6q11fte27Wuqv7r5dD//Z'


@pytest.mark.parametrize(
    "arith_b64,huff_b64",
    [
        (KAT_GRAY24X32_ARITH, KAT_GRAY24X32_HUFF),
        (KAT_RGB16X24_ARITH, KAT_RGB16X24_HUFF),
    ],
    ids=["gray24x32", "rgb16x24"],
)
def test_libjpeg_known_answer_vectors(arith_b64, huff_b64):
    arith = base64.b64decode(arith_b64)
    huff = base64.b64decode(huff_b64)
    # sanity: the committed arith stream really is SOF9-coded
    assert b"\xff\xc9" in arith and b"\xff\xc4" not in arith
    assert np.array_equal(decode_jpeg(arith), decode_jpeg(huff))


# ---------------------------------------------------------------------------
# Live interop with the system libjpeg-turbo (skip when no toolchain).
# Direction 1: libjpeg decodes OUR arithmetic stream to the same
# pixels as our Huffman stream of the same image. Direction 2: OUR
# decoder recovers coefficient-exact data from a libjpeg-encoded
# arithmetic stream (checked via the arith-vs-huff pixel identity).
# ---------------------------------------------------------------------------

_HARNESS_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>
#include <setjmp.h>
struct my_err { struct jpeg_error_mgr pub; jmp_buf env; };
static void my_exit(j_common_ptr c){ struct my_err*e=(struct my_err*)c->err; longjmp(e->env,1);}
static int do_decode(const char*in,const char*out){
  FILE*f=fopen(in,"rb"); if(!f)return 2;
  struct jpeg_decompress_struct d; struct my_err jerr;
  d.err=jpeg_std_error(&jerr.pub); jerr.pub.error_exit=my_exit;
  if(setjmp(jerr.env)){ jpeg_destroy_decompress(&d); fclose(f); return 3; }
  jpeg_create_decompress(&d); jpeg_stdio_src(&d,f); jpeg_read_header(&d,TRUE);
  jpeg_start_decompress(&d);
  int w=d.output_width,h=d.output_height,c=d.output_components;
  FILE*o=fopen(out,"wb"); fprintf(o,"%d %d %d\n",w,h,c);
  JSAMPARRAY buf=(*d.mem->alloc_sarray)((j_common_ptr)&d,JPOOL_IMAGE,w*c,1);
  while(d.output_scanline<d.output_height){ jpeg_read_scanlines(&d,buf,1); fwrite(buf[0],1,(size_t)w*c,o);}
  jpeg_finish_decompress(&d); jpeg_destroy_decompress(&d); fclose(f); fclose(o); return 0;
}
static int do_encode(const char*in,int w,int h,int c,int q,const char*out,int arith){
  FILE*f=fopen(in,"rb"); if(!f)return 2;
  unsigned char*raw=malloc((size_t)w*h*c);
  if(fread(raw,1,(size_t)w*h*c,f)!=(size_t)w*h*c)return 2;
  fclose(f);
  struct jpeg_compress_struct e; struct my_err jerr;
  e.err=jpeg_std_error(&jerr.pub); jerr.pub.error_exit=my_exit;
  if(setjmp(jerr.env)){ jpeg_destroy_compress(&e); return 3; }
  jpeg_create_compress(&e);
  FILE*o=fopen(out,"wb"); jpeg_stdio_dest(&e,o);
  e.image_width=w; e.image_height=h; e.input_components=c;
  e.in_color_space = c==3?JCS_RGB:JCS_GRAYSCALE;
  jpeg_set_defaults(&e); jpeg_set_quality(&e,q,TRUE);
  e.arith_code = arith?TRUE:FALSE;
  for(int i=0;i<e.num_components;i++){e.comp_info[i].h_samp_factor=1;e.comp_info[i].v_samp_factor=1;}
  jpeg_start_compress(&e,TRUE);
  JSAMPROW row;
  while(e.next_scanline<e.image_height){ row=raw+(size_t)e.next_scanline*w*c; jpeg_write_scanlines(&e,&row,1);}
  jpeg_finish_compress(&e); jpeg_destroy_compress(&e); fclose(o); free(raw); return 0;
}
int main(int argc,char**argv){
  if(argc>=4&&!strcmp(argv[1],"decode")) return do_decode(argv[2],argv[3]);
  if(argc>=8&&!strcmp(argv[1],"encarith")) return do_encode(argv[2],atoi(argv[3]),atoi(argv[4]),atoi(argv[5]),atoi(argv[6]),argv[7],1);
  if(argc>=8&&!strcmp(argv[1],"enchuff")) return do_encode(argv[2],atoi(argv[3]),atoi(argv[4]),atoi(argv[5]),atoi(argv[6]),argv[7],0);
  return 1;
}
"""


@pytest.fixture(scope="module")
def libjpeg_harness(tmp_path_factory):
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler")
    d = tmp_path_factory.mktemp("jarith")
    src = d / "jparith.c"
    src.write_text(_HARNESS_C)
    exe = d / "jparith"
    r = subprocess.run(
        [gcc, "-O2", "-o", str(exe), str(src), "-ljpeg"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"cannot build libjpeg harness: {r.stderr[:200]!r}")
    # probe: Debian builds enable arithmetic coding, but skip cleanly
    # on a libjpeg built without D/C_ARITH_CODING_SUPPORTED
    probe = np.full((8, 8), 99, np.uint8)
    (d / "p.raw").write_bytes(probe.tobytes())
    r = subprocess.run(
        [str(exe), "encarith", str(d / "p.raw"), "8", "8", "1", "85",
         str(d / "p.jpg")],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip("system libjpeg lacks arithmetic coding support")
    return exe, d


def _lib_decode(exe, d, data):
    (d / "in.jpg").write_bytes(data)
    r = subprocess.run(
        [str(exe), "decode", str(d / "in.jpg"), str(d / "out.raw")],
        capture_output=True,
    )
    assert r.returncode == 0, "libjpeg failed to decode the stream"
    hdr, raw = (d / "out.raw").read_bytes().split(b"\n", 1)
    w, h, c = map(int, hdr.split())
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)


def _lib_encode(exe, d, img, q, arith):
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    (d / "in.raw").write_bytes(np.ascontiguousarray(img).tobytes())
    r = subprocess.run(
        [str(exe), "encarith" if arith else "enchuff", str(d / "in.raw"),
         str(w), str(h), str(c), str(q), str(d / "enc.jpg")],
        capture_output=True,
    )
    assert r.returncode == 0
    return (d / "enc.jpg").read_bytes()


@pytest.mark.parametrize("quality", [50, 85])
def test_interop_libjpeg_decodes_our_arith(libjpeg_harness, quality):
    exe, d = libjpeg_harness
    for name, img in _images().items():
        for ri in (0, 3):
            a = encode_jpeg_arithmetic(img, quality, restart_interval=ri)
            h = encode_jpeg(img, quality, restart_interval=ri)
            lib_a = _lib_decode(exe, d, a)
            lib_h = _lib_decode(exe, d, h)
            assert np.array_equal(lib_a, lib_h), (name, quality, ri)


@pytest.mark.parametrize("quality", [50, 85, 95])
def test_interop_we_decode_libjpeg_arith(libjpeg_harness, quality):
    exe, d = libjpeg_harness
    for name, img in _images().items():
        a = _lib_encode(exe, d, img, quality, arith=True)
        h = _lib_encode(exe, d, img, quality, arith=False)
        assert b"\xff\xc9" in a
        assert np.array_equal(decode_jpeg(a), decode_jpeg(h)), (name, quality)
