"""MPEG audio (MP3) frame-header metadata — from scratch.

The metadata half of the MP3 boundary (ISO/IEC 11172-3 frame header
grammar): sync walk, version/layer/bitrate/samplerate tables, frame
length arithmetic, ID3v2 tag skipping (syncsafe sizes), and the
Xing/Info VBR frame-count tag. Duration comes from the exact
frame walk (samples-per-frame / samplerate summed per frame, so VBR
streams are exact, not estimated). Huffman/MDCT frame DECODE is the
documented codec boundary, like SILK/CELT for Opus and H.264 for MP4.
"""

from __future__ import annotations

import struct


class Mp3BoxError(ValueError):
    """Malformed MP3 payload."""


# kbps per bitrate index (1..14), Layer III
_BITRATE_V1 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
               224, 256, 320, None)
_BITRATE_V2 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
               144, 160, None)
_SAMPLERATE = {
    3: (44100, 48000, 32000),   # MPEG1
    2: (22050, 24000, 16000),   # MPEG2
    0: (11025, 12000, 8000),    # MPEG2.5
}


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise Mp3BoxError("ID3v2 size bytes are not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def _parse_frame_header(data: bytes, pos: int):
    """(version_bits, bitrate_kbps, samplerate, padding, channels,
    frame_bytes, samples_per_frame) or raises."""
    h = struct.unpack_from(">I", data, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        raise Mp3BoxError("lost frame sync")
    version = (h >> 19) & 3
    layer = (h >> 17) & 3
    if version == 1 or layer != 1:  # only Layer III
        raise Mp3BoxError("not an MPEG Layer III frame")
    protected = ((h >> 16) & 1) == 0  # bit 16 low => 16-bit CRC present
    bidx = (h >> 12) & 0xF
    sidx = (h >> 10) & 3
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    table = _BITRATE_V1 if version == 3 else _BITRATE_V2
    kbps = table[bidx]
    if kbps is None:
        raise Mp3BoxError("free/bad bitrate index")
    if sidx == 3:
        raise Mp3BoxError("reserved samplerate index")
    rate = _SAMPLERATE[version][sidx]
    coef = 144 if version == 3 else 72
    frame_bytes = coef * kbps * 1000 // rate + padding
    spf = 1152 if version == 3 else 576
    channels = 1 if mode == 3 else 2
    return (version, kbps, rate, padding, channels, frame_bytes, spf,
            protected)


def _xing_frame_count(data: bytes, pos: int, version: int, channels: int,
                      protected: bool, frame_bytes: int):
    """Frame count from a Xing/Info tag in the first frame, if any.
    A protected frame carries a 16-bit CRC between the header and the
    side info, shifting the tag by 2. The probe is bounded to the
    first frame's own bytes: a minimum-size frame (e.g. MPEG2 8 kbps)
    has no room for the 12-byte tag, and without the bound the read
    would extend into the NEXT frame where coincidental/crafted
    'Xing' bytes yield a bogus count."""
    if version == 3:
        side = 17 if channels == 1 else 32
    else:
        side = 9 if channels == 1 else 17
    off = pos + 4 + (2 if protected else 0) + side
    if off + 12 > pos + frame_bytes:
        return None  # tag cannot fit inside this frame
    tag = data[off : off + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    (flags,) = struct.unpack_from(">I", data, off + 4)
    if flags & 1:  # FRAMES flag
        return struct.unpack_from(">I", data, off + 8)[0]
    return None


def mp3_info(data: bytes) -> dict:
    """Walk every frame: returns bitrate_kbps (first frame),
    samplerate, channels, n_frames, duration_ms (exact per-frame sum —
    VBR included), vbr (any frame's bitrate differs), xing_frames
    (the VBR header's count when present), id3v2_bytes."""
    try:
        id3 = _skip_id3v2(data)
        pos = id3
        n = len(data)
        if pos + 4 > n:
            raise Mp3BoxError("no room for a frame header")
        first = None
        xing = None
        n_frames = 0
        total_samples = 0
        bitrates = set()
        id3v1 = False
        while pos + 4 <= n:
            if n_frames and data[pos : pos + 3] == b"TAG" and n - pos == 128:
                id3v1 = True  # trailing ID3v1 tag — extremely common
                pos = n
                break
            (version, kbps, rate, _pad, channels, frame_bytes, spf,
             protected) = _parse_frame_header(data, pos)
            if pos + frame_bytes > n:
                raise Mp3BoxError("frame overruns the stream")
            if first is None:
                first = (version, kbps, rate, channels)
                xing = _xing_frame_count(data, pos, version, channels,
                                         protected, frame_bytes)
            elif rate != first[2]:
                # frames virtually never change samplerate mid-stream;
                # a stream that does is malformed for our purposes
                raise Mp3BoxError("samplerate changes mid-stream")
            bitrates.add(kbps)
            n_frames += 1
            total_samples += spf
            pos += frame_bytes
        if first is None or n_frames == 0:
            raise Mp3BoxError("no MPEG frames")
        if pos != n:
            # symmetric strictness: ANY trailing remainder that is not
            # an ID3v1 tag is malformed (previously 1-3 bytes slipped
            # through while >= 4 raised)
            raise Mp3BoxError("trailing bytes after the last frame")
        _v, kbps0, rate0, ch0 = first
        return {
            "bitrate_kbps": kbps0,
            "samplerate": rate0,
            "channels": ch0,
            "n_frames": n_frames,
            "total_samples": total_samples,
            # integer-exact (and therefore oracle-replayable): frames
            # share one samplerate, so no float accumulation
            "duration_ms": total_samples * 1000 // rate0,
            "vbr": len(bitrates) > 1,
            "xing_frames": xing,
            "id3v2_bytes": id3,
            "id3v1": id3v1,
        }
    except Mp3BoxError:
        raise
    except (IndexError, struct.error) as e:
        raise Mp3BoxError(f"malformed MP3 stream: {e}") from None


# ---------------------------------------------------------------------------
# Writer (minimal valid streams for tests + oracles)
# ---------------------------------------------------------------------------

_BIDX_V1 = {v: i for i, v in enumerate(_BITRATE_V1) if v}
_SIDX_V1 = {44100: 0, 48000: 1, 32000: 2}


def encode_mp3(
    n_frames: int, bitrate_kbps: int = 128, samplerate: int = 44100,
    mono: bool = False, id3_size: int = 0, pad_every: int = 0,
    bitrate_pattern=None,
) -> bytes:
    """MPEG1 Layer III frames with valid headers and zeroed payloads
    (frame DECODE is the boundary; the header walk, lengths and
    durations are real). ``bitrate_pattern`` emits VBR streams;
    ``pad_every`` sets the padding bit on every k-th frame;
    ``id3_size`` prepends an ID3v2 tag of that payload size."""
    if n_frames < 1:
        raise Mp3BoxError("need at least one frame")
    if samplerate not in _SIDX_V1:
        raise Mp3BoxError(f"unsupported MPEG1 samplerate {samplerate}")
    out = bytearray()
    if id3_size:
        if id3_size >= 1 << 28:
            raise Mp3BoxError("ID3v2 size exceeds the syncsafe range")
        out += b"ID3\x04\x00\x00" + bytes([
            (id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
            (id3_size >> 7) & 0x7F, id3_size & 0x7F,
        ]) + b"\x00" * id3_size
    for i in range(n_frames):
        kbps = (bitrate_pattern[i % len(bitrate_pattern)]
                if bitrate_pattern else bitrate_kbps)
        bidx = _BIDX_V1.get(kbps)
        if bidx is None:
            raise Mp3BoxError(f"invalid MPEG1 Layer III bitrate {kbps}")
        padding = 1 if pad_every and (i + 1) % pad_every == 0 else 0
        mode = 3 if mono else 0
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (bidx << 12) | (_SIDX_V1[samplerate] << 10) \
            | (padding << 9) | (mode << 6)
        frame_bytes = 144 * kbps * 1000 // samplerate + padding
        out += struct.pack(">I", h) + b"\x00" * (frame_bytes - 4)
    return bytes(out)
