"""Ogg container (RFC 3533) + OpusHead (RFC 7845) metadata.

Third leg of the audio-container surface (WAV decodes natively,
FLAC STREAMINFO in audiocodec.py): the Ogg page walk — capture
pattern, lacing-value packet reassembly, granule positions, the
page-level CRC32 (poly 0x04C11DB7, unreflected, zeroed CRC field) —
plus the OpusHead identification header (channel count, pre-skip,
input sample rate) and the RFC 7845 duration rule: (last granule −
pre-skip) / 48000, granules always in 48 kHz units regardless of
input rate. Stream DECODE (SILK/CELT) is the documented codec
boundary, exactly like H.264 for MP4 and FLAC frames.
"""

from __future__ import annotations

import struct


class OggCodecError(ValueError):
    """Malformed Ogg/Opus payload."""


def _crc_table():
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        tbl.append(r)
    return tbl


_CRC_TABLE = _crc_table()


def ogg_crc(data: bytes) -> int:
    """The Ogg page checksum: CRC-32/MPEG-2 style but init 0 and no
    final xor (RFC 3533 §6)."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) & 0xFF) ^ b]
    return r


def iter_ogg_pages(data: bytes, verify_crc: bool = True):
    """Yield (header_type, granule, serial, page_seq, segments) per
    page; ``segments`` is the list of lacing-value segment bytes."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 4] != b"OggS":
            raise OggCodecError("missing OggS capture pattern")
        if pos + 27 > n:
            raise OggCodecError("truncated page header")
        version = data[pos + 4]
        if version != 0:
            raise OggCodecError(f"unsupported Ogg version {version}")
        htype = data[pos + 5]
        granule, serial, seq, crc = struct.unpack_from(
            "<qIII", data, pos + 6
        )
        nseg = data[pos + 26]
        lace = data[pos + 27 : pos + 27 + nseg]
        if len(lace) != nseg:
            raise OggCodecError("truncated segment table")
        body_start = pos + 27 + nseg
        body_len = sum(lace)
        if body_start + body_len > n:
            raise OggCodecError("page body overruns the stream")
        if verify_crc:
            page = bytearray(data[pos : body_start + body_len])
            page[22:26] = b"\x00\x00\x00\x00"
            if ogg_crc(bytes(page)) != crc:
                raise OggCodecError("page CRC mismatch")
        segs, off = [], body_start
        for lv in lace:
            segs.append(data[off : off + lv])
            off += lv
        yield htype, granule, serial, seq, segs
        pos = body_start + body_len


def ogg_opus_info(data: bytes) -> dict:
    """Container metadata of an Ogg Opus stream: channels, pre_skip,
    input_sample_rate (informational, per RFC 7845), n_pages,
    last_granule, duration_ms = (last_granule - pre_skip) / 48."""
    first_packet = None
    last_granule = None
    n_pages = 0
    serial0 = None
    for htype, granule, serial, _seq, segs in iter_ogg_pages(data):
        n_pages += 1
        if serial0 is None:
            serial0 = serial
        if serial != serial0:
            continue  # other multiplexed streams don't bound duration
        if first_packet is None and segs:
            first_packet = b"".join(segs)
        if granule >= 0:
            last_granule = granule
    if n_pages == 0 or first_packet is None:
        raise OggCodecError("no Ogg pages / packets")
    if not first_packet.startswith(b"OpusHead"):
        raise OggCodecError("first packet is not OpusHead")
    if len(first_packet) < 19:
        raise OggCodecError("OpusHead too short")
    version = first_packet[8]
    if version >> 4 != 0:  # RFC 7845 §5.1: major version must be 0
        raise OggCodecError(f"unsupported OpusHead version {version}")
    channels = first_packet[9]
    pre_skip, rate = struct.unpack_from("<HI", first_packet, 10)
    dur_ms = None
    if last_granule is not None:
        dur_ms = max(0, last_granule - pre_skip) * 1000 // 48000
    return {
        "channels": channels,
        "pre_skip": pre_skip,
        "input_sample_rate": rate,
        "n_pages": n_pages,
        "last_granule": last_granule,
        "duration_ms": dur_ms,
    }


# ---------------------------------------------------------------------------
# Writer (minimal valid streams for tests + oracles)
# ---------------------------------------------------------------------------


def _page(htype: int, granule: int, serial: int, seq: int,
          packets: list) -> bytes:
    lace = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lace += b"\xff" * q + bytes([r])
        body += p
    head = bytearray(b"OggS\x00" + bytes([htype]))
    head += struct.pack("<qIII", granule, serial, seq, 0)
    head += bytes([len(lace)]) + lace
    page = bytes(head) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def encode_ogg_opus(
    channels: int, pre_skip: int, input_rate: int, n_frames: int,
    frame_samples: int = 960, serial: int = 0x5041,
) -> bytes:
    """Minimal Ogg Opus stream: BOS page with OpusHead, a comment page
    (OpusTags), then one audio page per frame carrying a stub packet
    with cumulative 48 kHz granules — everything the metadata reader
    consumes is real; the packet payloads are stubs (frame DECODE is
    the codec boundary)."""
    if not (1 <= channels <= 8):
        raise OggCodecError("channels must be 1..8")
    if not (0 <= pre_skip < 1 << 16):
        raise OggCodecError("pre_skip out of the 16-bit field range")
    if not (0 <= input_rate < 1 << 32):
        raise OggCodecError("input_rate out of the 32-bit field range")
    head = (
        b"OpusHead" + bytes([1, channels])
        + struct.pack("<HIhB", pre_skip, input_rate, 0, 0)
    )
    tags = b"OpusTags" + struct.pack("<I", 10) + b"sqlpp-ogg\x00" \
        + struct.pack("<I", 0)
    out = [_page(0x02, 0, serial, 0, [head])]  # BOS
    out.append(_page(0x00, 0, serial, 1, [tags]))
    granule = pre_skip
    for i in range(n_frames):
        granule += frame_samples
        htype = 0x04 if i == n_frames - 1 else 0x00  # EOS on last
        out.append(_page(htype, granule, serial, 2 + i, [b"\xfc" + bytes([i & 0xFF])]))
    return b"".join(out)
