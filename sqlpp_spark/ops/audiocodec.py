"""Compressed-audio WAV codecs in pure numpy — G.711 mu-law / A-law
(WAVE format tags 7 / 6) and IMA ADPCM (format tag 0x11), plus a
minimal RIFF container reader/writer for them.

Shrinks the "compressed audio needs ffmpeg" boundary documented in
ops/multimodal.decode_audio: telephony-style WAV payloads (G.711) and
the classic 4-bit IMA ADPCM now decode natively. The G.711 expand
formulas are bit-identical to the stdlib ``audioop`` reference on all
256 codes (pinned by tests/test_multimodal.py where audioop imports;
audioop is deprecated-for-removal, which is WHY the formulas are
implemented from ITU-T G.711 directly rather than wrapping it).

Everything is table/ufunc numpy — no per-sample Python in the G.711
paths; IMA ADPCM's sequential predictor loops per nibble (inherently
serial per channel) but payloads decode independently per row, so the
mapInPandas batch path stays embarrassingly parallel.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioCodecError(ValueError):
    pass


# ---------------------------------------------------------------------------
# G.711 (ITU-T): 8-bit log companding <-> 16-bit linear
# ---------------------------------------------------------------------------


def _mulaw_table() -> np.ndarray:
    u = np.arange(256)
    uc = (~u) & 0xFF
    sign = (uc & 0x80) != 0
    exp = (uc >> 4) & 7
    mant = uc & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    a = np.arange(256) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 7
    mant = a & 0xF
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    # G.711 A-law: sign bit SET encodes the positive half
    return np.where(sign, mag, -mag).astype(np.int16)


MULAW_DECODE = _mulaw_table()
ALAW_DECODE = _alaw_table()


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """u-law bytes -> int16 linear (bit-equal to audioop.ulaw2lin)."""
    return MULAW_DECODE[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear (bit-equal to audioop.alaw2lin)."""
    return ALAW_DECODE[np.asarray(codes, dtype=np.uint8)]


def _mulaw_encode_table() -> np.ndarray:
    """Standard G.711 mu-law compressor (the classic public-domain
    g711.c segmented quantizer, 14-bit domain), precomputed for all
    65536 int16 inputs — bit-equal to audioop.lin2ulaw."""
    s = np.arange(-32768, 32768, dtype=np.int64) >> 2  # 14 bit
    mask = np.where(s < 0, 0x7F, 0xFF)
    v = np.minimum(np.abs(s), 8159) + (0x84 >> 2)
    seg_end = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
    seg = np.searchsorted(seg_end, v)
    uval = np.where(
        seg >= 8,
        0x7F,
        (seg << 4) | ((v >> np.minimum(seg + 1, 8)) & 0xF),
    )
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def _alaw_encode_table() -> np.ndarray:
    """Standard G.711 A-law compressor (13-bit domain) — bit-equal to
    audioop.lin2alaw."""
    s = np.arange(-32768, 32768, dtype=np.int64) >> 3  # 13 bit
    mask = np.where(s >= 0, 0xD5, 0x55)
    v = np.where(s >= 0, s, -s - 1)
    seg_end = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])
    seg = np.minimum(np.searchsorted(seg_end, v), 7)
    mant = np.where(seg < 2, (v >> 1) & 0xF, (v >> seg) & 0xF)
    aval = np.where(
        np.searchsorted(seg_end, v) >= 8, 0x7F, (seg << 4) | mant
    )
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


MULAW_ENCODE = _mulaw_encode_table()
ALAW_ENCODE = _alaw_encode_table()


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    return MULAW_ENCODE[np.asarray(samples, dtype=np.int64) + 32768]


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    return ALAW_ENCODE[np.asarray(samples, dtype=np.int64) + 32768]


# ---------------------------------------------------------------------------
# IMA ADPCM (4-bit, WAVE format 0x11 block layout; mono)
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)

_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_core_decode(nibbles, predictor: int, index: int):
    out = np.empty(len(nibbles), dtype=np.int16)
    pred, idx = int(predictor), int(index)
    for i, nib in enumerate(nibbles):
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
        out[i] = pred
    return out, pred, idx


def _ima_core_encode(samples, predictor: int, index: int):
    nibbles = np.empty(len(samples), dtype=np.uint8)
    pred, idx = int(predictor), int(index)
    for i, s in enumerate(samples):
        step = int(_IMA_STEPS[idx])
        delta = int(s) - pred
        nib = 8 if delta < 0 else 0
        if delta < 0:
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        # reconstruct exactly as the decoder will
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
        nibbles[i] = nib
    return nibbles, pred, idx


def ima_adpcm_decode_block(block: bytes, n_samples: int) -> np.ndarray:
    """One mono IMA ADPCM block: 4-byte header (int16 predictor,
    uint8 step index, reserved), then packed nibbles LOW-first."""
    if len(block) < 4:
        raise AudioCodecError("short IMA ADPCM block")
    pred = struct.unpack("<h", block[:2])[0]
    idx = block[2]
    if idx > 88:
        raise AudioCodecError(f"bad IMA step index {idx}")
    data = np.frombuffer(block, dtype=np.uint8, offset=4)
    nibs = np.empty(len(data) * 2, dtype=np.uint8)
    nibs[0::2] = data & 0xF
    nibs[1::2] = data >> 4
    decoded, _, _ = _ima_core_decode(nibs[: max(n_samples - 1, 0)], pred, idx)
    return np.concatenate(([np.int16(pred)], decoded))[:n_samples]


def ima_adpcm_encode_mono(
    samples: np.ndarray, samples_per_block: int = 505
) -> tuple[bytes, int]:
    """int16 mono -> IMA ADPCM blocks (WAV format 0x11 layout).
    Returns (data bytes, block_align). Each block stores its first
    sample verbatim in the header, then samples_per_block-1 nibbles."""
    samples = np.asarray(samples, dtype=np.int16)
    if (samples_per_block - 1) % 2:
        raise AudioCodecError("samples_per_block must be odd")
    block_align = 4 + (samples_per_block - 1) // 2
    out = bytearray()
    idx = 0
    for start in range(0, len(samples), samples_per_block):
        chunk = samples[start : start + samples_per_block]
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        body = chunk[1:]
        nibs, pred, idx = _ima_core_encode(body, pred, idx)
        if len(nibs) % 2:
            nibs = np.concatenate([nibs, np.zeros(1, dtype=np.uint8)])
        pad = (samples_per_block - 1 - len(body)) // 2
        packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
        out += packed.tobytes() + b"\x00" * pad
    return bytes(out), block_align


# ---------------------------------------------------------------------------
# Minimal RIFF/WAVE container for format tags 1 / 6 / 7 / 0x11
# ---------------------------------------------------------------------------

WAVE_PCM = 1
WAVE_ALAW = 6
WAVE_MULAW = 7
WAVE_IMA_ADPCM = 0x11


def parse_wav(b: bytes) -> dict:
    """Chunk walk: returns dict(format, channels, sample_rate,
    bits_per_sample, block_align, data, n_samples?). Tolerates extra
    chunks (LIST, fact, ...) per RIFF rules (word alignment)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise AudioCodecError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
    fmt = None
    data = None
    fact_samples = None
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise AudioCodecError("short fmt chunk")
            tag, ch, sr, _br, ba, bits = struct.unpack("<HHIIHH", body[:16])
            fmt = {
                "format": tag, "channels": ch, "sample_rate": sr,
                "block_align": ba, "bits_per_sample": bits,
            }
            if tag == WAVE_IMA_ADPCM and size >= 20:
                fmt["samples_per_block"] = struct.unpack("<H", body[18:20])[0]
        elif cid == b"fact" and size >= 4:
            fact_samples = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise AudioCodecError("missing fmt or data chunk")
    fmt["data"] = data
    fmt["fact_samples"] = fact_samples
    return fmt


def decode_wav(b: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (int16 samples interleaved, sample_rate, channels)
    for PCM 8/16-bit, G.711 u-law/A-law and mono IMA ADPCM."""
    w = parse_wav(b)
    tag, data, ch = w["format"], w["data"], w["channels"]
    if tag == WAVE_PCM and w["bits_per_sample"] == 16:
        s = np.frombuffer(data, dtype="<i2")
    elif tag == WAVE_PCM and w["bits_per_sample"] == 8:
        s = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
        ).astype(np.int16) * 256
    elif tag == WAVE_MULAW:
        s = mulaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif tag == WAVE_ALAW:
        s = alaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif tag == WAVE_IMA_ADPCM:
        if ch != 1:
            raise AudioCodecError("IMA ADPCM decode supports mono only")
        ba = w["block_align"]
        spb = w.get("samples_per_block") or (ba - 4) * 2 + 1
        total = w["fact_samples"]
        parts = []
        for off in range(0, len(data), ba):
            block = data[off : off + ba]
            n = min(spb, (total - len(parts) * spb) if total else spb)
            parts.append(ima_adpcm_decode_block(block, max(n, 0)))
        s = np.concatenate(parts) if parts else np.empty(0, dtype=np.int16)
        if total is not None:
            s = s[:total]
    else:
        raise AudioCodecError(
            f"unsupported WAVE format tag {tag} "
            "(PCM/G.711/IMA-ADPCM decode natively; other codecs need ffmpeg)"
        )
    return s, w["sample_rate"], ch


def write_wav(
    samples_or_codes: np.ndarray | bytes, sample_rate: int, fmt: int,
    channels: int = 1, samples_per_block: int = 505, n_samples: int | None = None,
) -> bytes:
    """Minimal WAV writer. For PCM pass int16 samples; for G.711 pass
    the 8-bit code bytes; for IMA ADPCM pass int16 samples (mono) —
    they are encoded here."""
    if fmt == WAVE_PCM:
        data = np.asarray(samples_or_codes, dtype="<i2").tobytes()
        bits, ba = 16, 2 * channels
        fact = None
        extra = b""
    elif fmt in (WAVE_MULAW, WAVE_ALAW):
        data = bytes(samples_or_codes)
        bits, ba = 8, channels
        fact = n_samples if n_samples is not None else len(data) // channels
        extra = b""
    elif fmt == WAVE_IMA_ADPCM:
        s = np.asarray(samples_or_codes, dtype=np.int16)
        data, ba = ima_adpcm_encode_mono(s, samples_per_block)
        bits = 4
        fact = len(s)
        extra = struct.pack("<HH", 2, samples_per_block)
    else:
        raise AudioCodecError(f"cannot write WAVE format {fmt}")
    byte_rate = sample_rate * ba
    fmt_body = struct.pack(
        "<HHIIHH", fmt, channels, sample_rate, byte_rate, ba, bits
    ) + extra
    chunks = [b"fmt ", struct.pack("<I", len(fmt_body)), fmt_body]
    if fact is not None:
        chunks += [b"fact", struct.pack("<I", 4), struct.pack("<I", fact)]
    chunks += [b"data", struct.pack("<I", len(data)), data]
    if len(data) % 2:
        chunks.append(b"\x00")
    body = b"".join(chunks)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------------------
# FLAC STREAMINFO metadata (container half of the FLAC boundary)
# ---------------------------------------------------------------------------
#
# The FLAC format (public spec, xiph.org / RFC 9639) opens with the
# "fLaC" marker and a chain of metadata blocks; the mandatory first
# block is STREAMINFO, a fixed 34-byte record carrying everything a
# pipeline needs to prune/plan audio work — sample rate, channels,
# bit depth, total samples, an MD5 of the raw audio. Parsing it needs
# no codec work, so (like mp4box.py for video) the metadata-first
# surface is real while the subframe/residual DECODE stays the
# documented boundary.

FLAC_SIGNATURE = b"fLaC"


def flac_streaminfo(data: bytes) -> dict:
    """Parse the STREAMINFO block of a FLAC stream (RFC 9639 §8.2):
    returns min/max block size, min/max frame size, sample_rate,
    channels, bits_per_sample, total_samples, md5 (hex)."""
    if data[:4] != FLAC_SIGNATURE or len(data) < 8:
        raise AudioCodecError("not a FLAC stream")
    btype = data[4] & 0x7F
    blen = int.from_bytes(data[5:8], "big")
    if btype != 0:
        raise AudioCodecError("first FLAC metadata block must be STREAMINFO")
    if blen != 34 or len(data) < 8 + 34:
        raise AudioCodecError("malformed STREAMINFO block")
    b = data[8 : 8 + 34]
    packed = int.from_bytes(b[10:18], "big")
    return {
        "min_block": int.from_bytes(b[0:2], "big"),
        "max_block": int.from_bytes(b[2:4], "big"),
        "min_frame": int.from_bytes(b[4:7], "big"),
        "max_frame": int.from_bytes(b[7:10], "big"),
        "sample_rate": packed >> 44,
        "channels": ((packed >> 41) & 0x7) + 1,
        "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
        "total_samples": packed & ((1 << 36) - 1),
        "md5": b[18:34].hex(),
    }


def write_flac_header(
    sample_rate: int, channels: int, bits_per_sample: int,
    total_samples: int, block_size: int = 4096, md5: bytes = b"\x00" * 16,
) -> bytes:
    """fLaC marker + a last-flagged STREAMINFO block (no audio
    frames — the metadata container tests/oracles need, not a playable
    stream; frame encode is the documented codec boundary)."""
    if not (1 <= channels <= 8):
        raise AudioCodecError("FLAC channels must be 1..8")
    if not (4 <= bits_per_sample <= 32):
        raise AudioCodecError("FLAC bits per sample must be 4..32")
    if sample_rate >= 1 << 20 or total_samples >= 1 << 36:
        raise AudioCodecError("sample_rate/total_samples out of field range")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    body = (
        block_size.to_bytes(2, "big") + block_size.to_bytes(2, "big")
        + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
        + packed.to_bytes(8, "big") + md5
    )
    assert len(body) == 34
    return FLAC_SIGNATURE + bytes([0x80]) + len(body).to_bytes(3, "big") + body
