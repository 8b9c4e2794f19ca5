"""FLAC frame decode/encode (ops/flaccodec.py, RFC 9639 §9): subframe
grammar, Rice residuals, stereo decorrelation, CRC/MD5 verification,
Spark decode leg, round-trip vs the existing STREAMINFO synthesizer."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sqlpp_spark.ops.audiocodec import AudioCodecError, flac_streaminfo
from sqlpp_spark.ops.flaccodec import (
    FlacError,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _roundtrip(samples, sr=44100, bps=16, **kw):
    b = encode_flac(samples, sr, bps, **kw)
    dec, dsr, dbps = decode_flac(b)
    want = np.asarray(samples)
    if want.ndim == 1:
        want = want[:, None]
    assert (dsr, dbps) == (sr, bps)
    assert dec.shape == want.shape
    assert (dec == want).all()
    return b


def test_crc_vectors():
    """Known-answer CRCs (poly 0x07 / 0x8005, init 0): '123456789'
    gives 0xF4 for CRC-8/SMBUS and 0xFEE8 for CRC-16/BUYPASS — the
    exact parameterizations RFC 9639 §9.2/9.3 specifies."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_roundtrip_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    _roundtrip(rng.integers(-lim, lim, 257), bps=bps, block_size=100)
    # full-scale extremes survive
    _roundtrip(np.array([lim - 1, -lim, 0, -1, 1]), bps=bps)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_modes(mode):
    t = np.arange(600)
    left = (3000 * np.sin(t / 20.0)).astype(np.int64)
    right = (0.7 * left + 100).astype(np.int64)
    st = np.stack([left, right], axis=1)
    _roundtrip(st, block_size=200, stereo_mode=mode, lpc_order=4)


def test_roundtrip_subframe_kinds():
    rng = np.random.default_rng(7)
    t = np.arange(1000)
    sine = (3000 * np.sin(t / 20.0)).astype(np.int64)
    # smooth -> fixed/LPC; the LPC stream must be strictly smaller
    # than verbatim would be (2 bytes/sample)
    b = _roundtrip(sine, block_size=256, lpc_order=8)
    assert len(b) < 2 * len(sine)
    _roundtrip(rng.integers(-32768, 32768, 500), block_size=192)  # noise
    _roundtrip(np.full(300, -5), block_size=128)  # constant
    _roundtrip(np.zeros(100, dtype=np.int64))
    _roundtrip(np.zeros((0,), dtype=np.int64))  # empty stream
    _roundtrip(rng.integers(-1000, 1000, (100, 8)), block_size=64)  # 8ch
    # >127 frames exercises multi-byte coded frame numbers
    _roundtrip(rng.integers(-100, 100, (40000,)), block_size=256)


def test_force_lpc_emits_lpc_subframes():
    """force_lpc (the LPC-oracle knob) must emit LPC subframes even
    where fixed would be cheaper, and stay bit-exact — including on a
    triangle wave (the oracle corpus shape) and on a constant block
    (degenerate autocorrelation falls back safely)."""
    t = np.arange(160, dtype=np.int64)
    p, b = 20 + 2 * (7 % 13), 7 % 17
    tri = np.abs(2 * ((t + b) % p) - p) * 400 - 8000
    plain = encode_flac(tri, 8000, 16, block_size=64, lpc_order=4)
    forced = encode_flac(tri, 8000, 16, block_size=64, lpc_order=4,
                         force_lpc=True)
    assert forced != plain  # the knob changed the chosen subframes
    for stream in (plain, forced):
        dec, _, _ = decode_flac(stream)
        assert (dec.reshape(-1) == tri).all()
    # LPC subframe header: type bits 1xxxxx = 32 + order-1 = 0x23 for
    # order 4; the first subframe byte after the frame header carries
    # it as 0<type><wasted> = 0x46 — present in forced, not in plain
    assert any(0x46 == x for x in forced)
    # degenerate: constant signal, force_lpc must not crash
    const = encode_flac(np.full(100, 7), 8000, 16, force_lpc=True,
                        lpc_order=4)
    dec, _, _ = decode_flac(const)
    assert (dec.reshape(-1) == 7).all()


def test_force_lpc_beats_verbatim_override():
    """Full-range white noise makes the LPC cost estimate exceed the
    VERBATIM cost; the verbatim fallback must not silently override a
    force_lpc selection (the LPC oracle contract guarantees LPC
    subframes hash-verify as LPC)."""
    rng = np.random.default_rng(9)
    noise = rng.integers(-30000, 30000, 64).astype(np.int64)
    forced = encode_flac(noise, 8000, 16, block_size=64, lpc_order=4,
                         force_lpc=True)
    dec, _, _ = decode_flac(forced)
    assert (dec.reshape(-1) == noise).all()
    # subframe header byte for LPC order 4: 0 + (32+3) + wasted=0 -> 0x46
    assert 0x46 in forced
    # and the plain encoder is free to pick VERBATIM here (0x02 header)
    plain = encode_flac(noise, 8000, 16, block_size=64, lpc_order=4)
    dec2, _, _ = decode_flac(plain)
    assert (dec2.reshape(-1) == noise).all()


@pytest.mark.parametrize("sr", [8000, 11025, 44100, 88200, 655350])
def test_roundtrip_sample_rates(sr):
    """Covers the fixed-table, 16-bit-Hz and Hz/10 header codings."""
    t = np.arange(100)
    _roundtrip((1000 * np.sin(t / 9.0)).astype(np.int64), sr=sr)


def test_streaminfo_consistency_with_header_synthesizer():
    """encode_flac's STREAMINFO parses with the same flac_streaminfo
    used for the metadata-only corpus — the two FLAC surfaces agree."""
    pcm = (np.arange(500, dtype=np.int64) % 200) - 100
    b = encode_flac(pcm, 22050, 16, block_size=128)
    info = flac_streaminfo(b)
    assert info["sample_rate"] == 22050
    assert info["channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 500
    assert info["md5"] != "0" * 32  # real decoded-audio MD5


def test_corruption_detected():
    """Flip one payload byte: CRC-16 (or the MD5/CRC-8) must catch it;
    truncation and junk raise the module error."""
    pcm = (np.arange(300, dtype=np.int64) * 41 % 2000) - 1000
    good = encode_flac(pcm, 8000, 16, block_size=128)
    assert decode_flac(good)[0].shape == (300, 1)
    # corrupt one byte inside the first frame payload
    frame_start = 4 + 4 + 34  # marker + block header + STREAMINFO
    bad = bytearray(good)
    bad[frame_start + 10] ^= 0x41
    with pytest.raises(FlacError):
        decode_flac(bytes(bad))
    with pytest.raises(FlacError):
        decode_flac(good[:-3])  # truncated final frame
    # container-level junk raises the base AudioCodecError (from the
    # shared STREAMINFO parser); FlacError subclasses it, so guarded
    # decode paths catch both with one except clause
    for junk in (b"", b"fLaC", b"fLaC" + b"\x00" * 40, b"RIFFxxxxWAVE"):
        with pytest.raises(AudioCodecError):
            decode_flac(junk)
    # declared-vs-decoded sample count mismatch
    lied = bytearray(good)
    # total_samples live in STREAMINFO bytes 21..26 of the 34-byte body
    packed = int.from_bytes(lied[8 + 10 : 8 + 18], "big")
    packed = (packed & ~((1 << 36) - 1)) | 123
    lied[8 + 10 : 8 + 18] = packed.to_bytes(8, "big")
    with pytest.raises(FlacError):
        decode_flac(bytes(lied))


def test_wasted_bits_subframe_decodes():
    """Hand-build a frame with a wasted-bits CONSTANT subframe (the
    encoder never emits one, so pin the decoder path directly)."""
    from sqlpp_spark.ops.audiocodec import write_flac_header
    from sqlpp_spark.ops.flaccodec import _BitWriter

    header = write_flac_header(8000, 1, 16, 4, block_size=4)
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)   # 16-bit block size follows
    bw.write(4, 4)   # sample rate 8000 from table
    bw.write(0, 4)   # mono
    bw.write(4, 3)   # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)   # coded frame number 0
    bw.write(3, 16)  # block size 4 - 1
    bw.align()
    hdr = bw.getvalue()
    hdr += bytes([crc8(hdr)])
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)   # CONSTANT
    bw.write(1, 1)   # wasted bits flag
    bw.write(1, 2)   # unary '01' -> 1+1 = 2 wasted bits
    bw.write_signed(-3, 14)  # 16 - 2 effective bits
    bw.align()
    frame = hdr + bw.getvalue()
    frame += struct.pack(">H", crc16(frame))
    dec, sr, bps = decode_flac(header + frame)
    assert sr == 8000 and bps == 16
    assert dec.reshape(-1).tolist() == [-12, -12, -12, -12]  # -3 << 2


def test_spark_decode_audio_flac_leg(spark):
    """decode_audio routes fLaC payloads through the frame decoder;
    junk and truncated FLAC fall to decoded=false, WAV still works."""
    import io
    import wave as wavmod

    from sqlpp_spark.ops.multimodal import decode_audio

    pcm = ((np.arange(160, dtype=np.int64) * 411 + 13) % 65536) - 32768
    flac = encode_flac(pcm, 8000, 16, block_size=64)
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    rows = decode_audio(spark.createDataFrame(
        [(1, bytearray(flac)), (2, bytearray(buf.getvalue())),
         (3, bytearray(flac[:30])), (4, bytearray(b"junk"))],
        "media_id long, payload binary",
    )).collect()
    by = {r.media_id: r for r in rows}
    assert by[1].decoded and by[2].decoded
    # FLAC and WAV decode of the SAME samples agree exactly
    for f in ("sample_rate", "n_channels", "n_samples", "duration_ms",
              "energy", "zero_crossings", "rms"):
        assert getattr(by[1], f) == getattr(by[2], f), f
    assert not by[3].decoded and not by[4].decoded
