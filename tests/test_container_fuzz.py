"""Mutation fuzzing of every container parser (round-9).

The malformed-payload CONTRACT across the codec surface is: a parser
either succeeds or raises its own module error (which the Spark
extractors convert to decoded=false rows). A stray IndexError /
struct.error / TypeError / OverflowError escaping a parser would fail
a whole mapInPandas task on one bad crawl payload. This module
hammers each parser with byte flips, truncations, splices and random
garbage derived from VALID streams, asserting the contract holds.
"""

from __future__ import annotations

import os

import pytest

N_EXAMPLES = int(os.environ.get("SQLPP_FUZZ_EXAMPLES", "120"))

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAS_HYP = True
except ImportError:  # pragma: no cover
    HAS_HYP = False

pytestmark = pytest.mark.skipif(not HAS_HYP, reason="hypothesis required")


import functools


@functools.lru_cache(maxsize=1)
def _targets():
    import numpy as np

    from sqlpp_spark.ops import imagecodec as IC
    from sqlpp_spark.ops.audiocodec import (
        AudioCodecError, flac_streaminfo, write_flac_header,
    )
    from sqlpp_spark.ops.exif import (
        ExifError, build_exif_tiff, exif_from_jpeg, insert_exif_app1,
    )
    from sqlpp_spark.ops.gifcodec import GifCodecError, decode_gif_frames, encode_gif
    from sqlpp_spark.ops.mp3box import Mp3BoxError, encode_mp3, mp3_info
    from sqlpp_spark.ops.mp4box import Mp4BoxError, encode_mp4, mp4_info
    from sqlpp_spark.ops.oggcodec import (
        OggCodecError, encode_ogg_opus, ogg_opus_info,
    )
    from sqlpp_spark.ops.flaccodec import FlacError, decode_flac, encode_flac
    from sqlpp_spark.ops.warc import (
        WarcError, http_response_block, parse_warc, write_warc,
    )
    from sqlpp_spark.ops.webpcodec import (
        WebpCodecError, decode_webp, encode_webp_animated,
        encode_webp_lossless,
    )

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    jpeg = IC.encode_jpeg(np.stack([img] * 3, axis=-1))
    targets = {
        "mp4": (
            encode_mp4(64, 48, 9, 40, 3),
            mp4_info, Mp4BoxError,
        ),
        "flac": (
            write_flac_header(44100, 2, 16, 123456),
            flac_streaminfo, AudioCodecError,
        ),
        "ogg": (
            encode_ogg_opus(2, 312, 48000, 4),
            ogg_opus_info, OggCodecError,
        ),
        "exif": (
            insert_exif_app1(
                jpeg, build_exif_tiff(6, "Cam", "2026:01:01 00:00:00", 8, 8)
            ),
            exif_from_jpeg, ExifError,
        ),
        "warc": (
            write_warc([
                ({"WARC-Type": "response", "WARC-Target-URI": "http://e/1"},
                 http_response_block(200, "text/html", b"<p>x</p>")),
                ({"WARC-Type": "resource"}, b"abc"),
            ]),
            parse_warc, WarcError,
        ),
        "gif": (
            encode_gif(np.stack([img] * 3, axis=-1)),
            decode_gif_frames, GifCodecError,
        ),
        "mp3": (
            encode_mp3(7, 128, 44100, id3_size=32, pad_every=3),
            mp3_info, Mp3BoxError,
        ),
        "warc_seg": (
            write_warc([
                ({"WARC-Type": "response", "WARC-Target-URI": "http://e/1"},
                 http_response_block(200, "text/html", b"<p>x</p>" * 40)),
                ({"WARC-Type": "resource"}, b"abc" * 100),
                ({"WARC-Type": "resource"}, b"q" * 500),
            ]),
            lambda b: __import__(
                "sqlpp_spark.ops.warc", fromlist=["segment_warc"]
            ).segment_warc(b, 300),
            WarcError,
        ),
        "flac_frames": (
            encode_flac(
                ((np.arange(200, dtype=np.int64) * 37 + 11) % 4096) - 2048,
                8000, 16, block_size=64, lpc_order=4,
            ),
            decode_flac, AudioCodecError,  # FlacError subclasses it
        ),
        "webp": (
            encode_webp_lossless(
                np.stack([img] * 3, axis=-1),
                subtract_green=True, cache_bits=4,
            ),
            decode_webp, WebpCodecError,
        ),
        # r11: the VP8 lossy pixel path (committed libwebp stream —
        # mutations must decode or raise the module error)
        "vp8_lossy": (
            __import__("base64").b64decode(
                __import__(
                    "sqlpp_spark.ops.vp8codec",
                    fromlist=["CONFORMANCE_STREAMS"],
                ).CONFORMANCE_STREAMS["mixed33x47_q90"]
            ),
            decode_webp, WebpCodecError,
        ),
        # r11: animated container compositing (VP8X/ANIM/ANMF walk)
        "webp_anim": (
            encode_webp_animated(
                [np.stack([img] * 3, axis=-1)[:10, :10]] * 3, 25
            ),
            lambda b: __import__(
                "sqlpp_spark.ops.webpcodec",
                fromlist=["decode_webp_frames"],
            ).decode_webp_frames(b, 4),
            WebpCodecError,
        ),
        # r11: gzipped WARC (member-per-record Common Crawl layout)
        "warc_gz": (
            __import__(
                "sqlpp_spark.ops.warc", fromlist=["write_warc_gz"]
            ).write_warc_gz([
                ({"WARC-Type": "response",
                  "WARC-Target-URI": "http://e/1"},
                 http_response_block(200, "text/html", b"<p>x</p>" * 30)),
                ({"WARC-Type": "resource"}, b"abc" * 60),
            ]),
            parse_warc, WarcError,
        ),
        # r11: HEIF/AVIF item grammar (committed libheif stream)
        "heif": (
            __import__("base64").b64decode(
                __import__(
                    "sqlpp_spark.ops.mp4box",
                    fromlist=["HEIF_CONFORMANCE_STREAMS"],
                ).HEIF_CONFORMANCE_STREAMS["heic_alpha"]
            ),
            lambda b: __import__(
                "sqlpp_spark.ops.mp4box", fromlist=["heif_info"]
            ).heif_info(b),
            Mp4BoxError,
        ),
        # r11: the QM arithmetic entropy path (SOF9 + DAC + restarts)
        "jpeg_arith": (
            IC.encode_jpeg_arithmetic(
                np.stack([img] * 3, axis=-1), quality=85,
                subsampling="420", restart_interval=2,
            ),
            IC.decode_jpeg, IC.ImageCodecError,
        ),
    }
    assert issubclass(FlacError, AudioCodecError)
    return targets


NAMES = ["mp4", "flac", "ogg", "exif", "warc", "gif", "mp3",
         "flac_frames", "warc_seg", "warc_gz", "webp", "vp8_lossy",
         "webp_anim", "heif", "jpeg_arith"]


if HAS_HYP:

    @st.composite
    def _mutation(draw):
        kind = draw(st.sampled_from(["flip", "truncate", "splice", "garbage"]))
        return (
            kind,
            draw(st.integers(0, 10**9)),   # position seed
            draw(st.integers(1, 64)),      # extent
            draw(st.binary(min_size=0, max_size=64)),
        )

    @pytest.mark.parametrize("name", NAMES)
    @settings(max_examples=N_EXAMPLES, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(_mutation())
    def test_container_parser_mutation_contract(name, mutation):
        data, parser, error_cls = _targets()[name]
        kind, pos_seed, extent, blob = mutation
        b = bytearray(data)
        pos = pos_seed % max(1, len(b))
        if kind == "flip":
            for i in range(extent):
                b[(pos + i) % len(b)] ^= 1 + (pos_seed >> 8) % 255
            payload = bytes(b)
        elif kind == "truncate":
            payload = bytes(b[: pos])
        elif kind == "splice":
            payload = bytes(b[:pos]) + blob + bytes(b[pos:])
        else:
            payload = blob
        try:
            parser(payload)
        except error_cls:
            pass  # the contract: module error only
        # any OTHER exception type propagates and fails the test
