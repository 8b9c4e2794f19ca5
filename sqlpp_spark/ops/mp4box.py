"""ISO Base Media File Format (MP4) container metadata — from scratch.

Implements the box (atom) structure of ISO/IEC 14496-12 (public spec;
reference behavior: the metadata-first multimodal pattern of
SCALING.md — prune/plan on typed metadata BEFORE any expensive
decode). This is the container half of the MP4/H.264 boundary named
in VERDICT r8: a training-data pipeline over crawl video needs track
geometry, duration, sample counts and KEYFRAME positions to plan
frame sampling and filter junk — all of which live in `moov` and are
parseable without any codec work. The H.264 *pixel* decode itself
remains the documented ffmpeg boundary.

Parsed surface:
- box walk incl. 64-bit largesize and size-0 (to-EOF) boxes
- `ftyp` major brand
- `mvhd` movie timescale/duration (versions 0 and 1)
- per `trak`: `tkhd` track id + presentation width/height (16.16
  fixed point, versions 0/1), `mdhd` media timescale/duration,
  `hdlr` handler type, `stsd` sample-entry fourcc (+ coded
  width/height for visual entries), `stts` sample count/total delta,
  `stsz` sample sizes, `stss` sync-sample (keyframe) numbers (absent
  table = every sample is a keyframe, per spec 8.6.2).

The writer emits minimal-but-valid streams (ftyp + mvhd + one video
trak + mdat) for round-trip tests and the closed-form Spark/DuckDB
oracle (queries/extensions.py multimodal_mp4_metadata_oracle).
"""

from __future__ import annotations

import struct

FTYP_SIGNATURES = (b"ftyp",)


class Mp4BoxError(ValueError):
    """Malformed or unsupported ISO-BMFF payload."""


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _u64(b: bytes, off: int) -> int:
    return struct.unpack_from(">Q", b, off)[0]


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end) — the fundamental 14496-12 §4.2 walk."""
    end = len(data) if end is None else end
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise Mp4BoxError("truncated box header")
        size = _u32(data, pos)
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise Mp4BoxError("truncated largesize header")
            size = _u64(data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise Mp4BoxError(f"box {btype!r} overruns its container")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in iter_boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _fullbox(data: bytes, s: int):
    """(version, flags, payload offset after the FullBox header)."""
    return data[s], _u32(data, s) & 0xFFFFFF, s + 4


def _parse_mvhd(data: bytes, s: int, e: int):
    v, _fl, p = _fullbox(data, s)
    if e - p < (28 if v == 1 else 16):
        raise Mp4BoxError("mvhd box too small for its version")
    if v == 1:
        return _u32(data, p + 16), _u64(data, p + 20)  # timescale, duration
    return _u32(data, p + 8), _u32(data, p + 12)


def _parse_tkhd(data: bytes, s: int, e: int):
    v, _fl, p = _fullbox(data, s)
    if e - p < (92 if v == 1 else 80):
        raise Mp4BoxError("tkhd box too small for its version")
    if v == 1:
        track_id = _u32(data, p + 16)
        rest = p + 24  # creation+modification (8+8) + id + reserved
    else:
        track_id = _u32(data, p + 8)
        rest = p + 16
    # duration (4 or 8 bytes by version) sits at `rest`; reserved(8),
    # layer/group/volume/reserved(8) and matrix(36) precede w/h
    rest += 8 if v == 1 else 4
    rest += 8 + 8 + 36  # reserved[2], layer/group/volume/reserved, matrix
    width = _u32(data, rest) >> 16  # 16.16 fixed
    height = _u32(data, rest + 4) >> 16
    return track_id, width, height


def _parse_mdhd(data: bytes, s: int, e: int):
    v, _fl, p = _fullbox(data, s)
    if e - p < (28 if v == 1 else 16):
        raise Mp4BoxError("mdhd box too small for its version")
    if v == 1:
        return _u32(data, p + 16), _u64(data, p + 20)
    return _u32(data, p + 8), _u32(data, p + 12)


def _check_entries(n: int, entry_bytes: int, p: int, e: int, box: str) -> None:
    """A declared entry count must FIT inside its own box — without
    this, a corrupted 32-bit count silently reads adjacent boxes'
    bytes (still inside ``data``, so no struct.error fires) and can
    materialize a multi-GB list from a ~KB box, breaking the
    decoded=false malformed-payload contract downstream."""
    if n < 0 or p + n * entry_bytes > e:
        raise Mp4BoxError(f"{box} entry count {n} overruns its box")


def _parse_stts(data: bytes, s: int, e: int):
    _v, _fl, p = _fullbox(data, s)
    n = _u32(data, p)
    _check_entries(n, 8, p + 4, e, "stts")
    total_samples = total_delta = 0
    entries = []
    for i in range(n):
        cnt = _u32(data, p + 4 + 8 * i)
        delta = _u32(data, p + 8 + 8 * i)
        total_samples += cnt
        total_delta += cnt * delta
        entries.append((cnt, delta))
    return total_samples, total_delta, entries


def sample_decode_time(entries, sample_no: int) -> int:
    """Decode time (in media-timescale units) of 1-based ``sample_no``
    from an stts run-length table — the cumulative sum of the deltas of
    all preceding samples (ISO/IEC 14496-12 §8.6.1.2: DT(n+1) =
    DT(n) + delta(n)). Exact for mixed-delta tables, unlike an average-
    delta approximation. Samples beyond the table clamp to its end."""
    t = 0
    remaining = sample_no - 1
    for cnt, delta in entries:
        if remaining <= cnt:
            return t + remaining * delta
        t += cnt * delta
        remaining -= cnt
    return t


def _parse_stss(data: bytes, s: int, e: int):
    _v, _fl, p = _fullbox(data, s)
    n = _u32(data, p)
    _check_entries(n, 4, p + 4, e, "stss")
    return [_u32(data, p + 4 + 4 * i) for i in range(n)]


def _parse_stsz(data: bytes, s: int, e: int):
    _v, _fl, p = _fullbox(data, s)
    uniform = _u32(data, p)
    n = _u32(data, p + 4)
    if uniform:
        return n, uniform * n
    _check_entries(n, 4, p + 8, e, "stsz")
    return n, sum(_u32(data, p + 8 + 4 * i) for i in range(n))


def mp4_info(data: bytes) -> dict:
    """Container metadata of an ISO-BMFF stream: brand, movie
    timescale/duration, and one dict per track (id, handler, codec
    fourcc, width/height, sample count/total size, keyframes)."""
    try:
        if len(data) < 12 or data[4:8] != b"ftyp":
            raise Mp4BoxError("not an ISO-BMFF stream (no ftyp)")
        out: dict = {"brand": data[8:12].decode("latin1"), "tracks": []}
        moov = _find(data, 0, len(data), b"moov")
        if moov is None:
            raise Mp4BoxError("no moov box")
        ms, me = moov
        mvhd = _find(data, ms, me, b"mvhd")
        if mvhd is None:
            raise Mp4BoxError("no mvhd box")
        ts, dur = _parse_mvhd(data, *mvhd)
        if ts == 0:
            raise Mp4BoxError("mvhd timescale is zero")
        out["timescale"] = ts
        out["duration_ms"] = dur * 1000 // ts
        for t, s, e in iter_boxes(data, ms, me):
            if t != b"trak":
                continue
            tr: dict = {}
            tkhd = _find(data, s, e, b"tkhd")
            if tkhd:
                tr["track_id"], tr["width"], tr["height"] = _parse_tkhd(
                    data, *tkhd
                )
            mdia = _find(data, s, e, b"mdia")
            if mdia is None:
                raise Mp4BoxError("trak without mdia")
            ds, de = mdia
            mdhd = _find(data, ds, de, b"mdhd")
            if mdhd:
                mts, mdur = _parse_mdhd(data, *mdhd)
                tr["media_timescale"] = mts
                tr["media_duration"] = mdur
            hdlr = _find(data, ds, de, b"hdlr")
            if hdlr:
                hs, _he = hdlr
                tr["handler"] = data[hs + 8 : hs + 12].decode("latin1")
            minf = _find(data, ds, de, b"minf")
            if minf is None:
                raise Mp4BoxError("mdia without minf")
            stbl = _find(data, minf[0], minf[1], b"stbl")
            if stbl is None:
                raise Mp4BoxError("minf without stbl")
            bs, be = stbl
            stsd = _find(data, bs, be, b"stsd")
            if stsd:
                ss, _se = stsd
                # FullBox + entry_count, then the first sample entry
                entry = ss + 8
                tr["codec"] = data[entry + 4 : entry + 8].decode("latin1")
                if tr.get("handler") == "vide":
                    # VisualSampleEntry: 8 hdr + 6 reserved + 2 dri +
                    # 16 predefined/reserved, then width/height u16
                    tr["coded_width"] = struct.unpack_from(
                        ">H", data, entry + 32
                    )[0]
                    tr["coded_height"] = struct.unpack_from(
                        ">H", data, entry + 34
                    )[0]
            stts = _find(data, bs, be, b"stts")
            n_samples = total_delta = 0
            stts_entries: list = []
            if stts:
                n_samples, total_delta, stts_entries = _parse_stts(
                    data, *stts
                )
            tr["n_samples"] = n_samples
            tr["total_delta"] = total_delta
            tr["stts_entries"] = stts_entries
            stsz = _find(data, bs, be, b"stsz")
            if stsz:
                _n, total_bytes = _parse_stsz(data, *stsz)
                tr["sample_bytes"] = total_bytes
            stss = _find(data, bs, be, b"stss")
            if stss is not None:
                tr["keyframes"] = _parse_stss(data, *stss)
            else:
                # spec 8.6.2: no stss ⇒ every sample is a sync sample
                tr["keyframes"] = list(range(1, n_samples + 1))
            out["tracks"].append(tr)
        if not out["tracks"]:
            raise Mp4BoxError("moov without trak")
        return out
    except Mp4BoxError:
        raise
    except (IndexError, struct.error) as e:
        raise Mp4BoxError(f"malformed ISO-BMFF stream: {e}") from None


# ---------------------------------------------------------------------------
# Writer (minimal valid streams for tests + oracles)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4(
    width: int, height: int, n_samples: int, sample_delta: int,
    keyframe_every: int, timescale: int = 1000, track_id: int = 1,
    codec: bytes = b"avc1", brand: bytes = b"isom", version: int = 0,
    stts_runs=None,
) -> bytes:
    """Minimal valid ISO-BMFF stream: ftyp + moov(mvhd, one video trak
    with tkhd/mdhd/hdlr/stbl) + a stub mdat. Sample table: uniform
    deltas, 100+i-byte samples, a keyframe every ``keyframe_every``
    samples (always including sample 1). ``version=1`` exercises the
    64-bit mvhd/tkhd/mdhd forms. ``stts_runs`` replaces the uniform
    table with an explicit [(count, delta), ...] run-length list
    (counts must sum to n_samples) — mixed-delta streams for the
    cumulative decode-time walk."""
    if n_samples < 1 or keyframe_every < 1:
        raise Mp4BoxError("need n_samples >= 1 and keyframe_every >= 1")
    if stts_runs is not None:
        if sum(c for c, _d in stts_runs) != n_samples:
            raise Mp4BoxError("stts_runs counts must sum to n_samples")
        duration = sum(c * d for c, d in stts_runs)
    else:
        duration = n_samples * sample_delta

    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)

    if version == 1:
        mvhd_body = (
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
            + b"\x00" * 10 + _MATRIX + b"\x00" * 24
            + struct.pack(">I", track_id + 1)
        )
        tkhd_body = (
            struct.pack(">QQI", 0, 0, track_id) + b"\x00" * 4
            + struct.pack(">Q", duration) + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0) + _MATRIX
            + struct.pack(">II", width << 16, height << 16)
        )
        mdhd_body = (
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0)
        )
    else:
        mvhd_body = (
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
            + b"\x00" * 10 + _MATRIX + b"\x00" * 24
            + struct.pack(">I", track_id + 1)
        )
        tkhd_body = (
            struct.pack(">III", 0, 0, track_id) + b"\x00" * 4
            + struct.pack(">I", duration) + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0) + _MATRIX
            + struct.pack(">II", width << 16, height << 16)
        )
        mdhd_body = (
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0)
        )

    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"graft\x00")
    # VisualSampleEntry: reserved[6] + data_reference_index, then the
    # 16 predefined/reserved bytes, width/height, resolution, etc.
    sample_entry = _box(
        codec,
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32 + struct.pack(">H", 0x18) + struct.pack(">h", -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    runs = stts_runs if stts_runs is not None else [(n_samples,
                                                     sample_delta)]
    stts = _full(b"stts", 0, 0,
                 struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">II", c, d) for c, d in runs))
    keyframes = list(range(1, n_samples + 1, keyframe_every))
    stss = _full(
        b"stss", 0, 0,
        struct.pack(">I", len(keyframes))
        + b"".join(struct.pack(">I", k) for k in keyframes),
    )
    sizes = [100 + i for i in range(n_samples)]
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", sz) for sz in sizes),
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(
        b"mdia",
        _full(b"mdhd", version, 0, mdhd_body) + hdlr + minf,
    )
    trak = _box(b"trak", _full(b"tkhd", version, 7, tkhd_body) + mdia)
    moov = _box(b"moov", _full(b"mvhd", version, 0, mvhd_body) + trak)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


# ---------------------------------------------------------------------------
# HEIF / AVIF still-image metadata (ISO 23008-12 on the 14496-12 box
# grammar above). Metadata-first: dimensions, codec, bit depth,
# rotation, alpha, and primary-payload size WITHOUT touching the coded
# AV1/HEVC data — the pruning step a crawl pipeline runs before
# deciding what to hand to a real decoder (the documented
# libaom/libde265 decode boundary). Conformance:
# tests/test_heif_interop.py checks every reported property against
# the system libheif on libheif-ENCODED files (x265 HEIC, aom AVIF).
# ---------------------------------------------------------------------------

_HEIF_BRANDS = {
    b"avif": "avif", b"avis": "avif",
    b"heic": "heic", b"heix": "heic", b"hevc": "heic", b"heim": "heic",
    b"mif1": "heif", b"msf1": "heif",
}


def heif_info(data: bytes) -> dict:
    """Parse a HEIF-family (HEIC/AVIF) still image's metadata."""
    try:
        return _heif_info_inner(data)
    except Mp4BoxError:
        raise
    except (IndexError, ValueError, TypeError, struct.error, KeyError) as ex:
        raise Mp4BoxError(f"malformed HEIF: {ex!r}") from None


def _heif_info_inner(data: bytes) -> dict:
    boxes = {t: (s, e) for t, s, e in iter_boxes(data)}
    if b"ftyp" not in boxes:
        raise Mp4BoxError("no ftyp box")
    fs, fe = boxes[b"ftyp"]
    major = data[fs:fs + 4]
    compat = [data[o:o + 4] for o in range(fs + 8, fe, 4)]
    fmt = _HEIF_BRANDS.get(major)
    if fmt in (None, "heif"):
        for b in compat:
            got = _HEIF_BRANDS.get(b)
            if got in ("avif", "heic"):
                fmt = got
                break
    if fmt is None:
        raise Mp4BoxError(f"not a HEIF-family brand: {major!r}")
    if b"meta" not in boxes:
        raise Mp4BoxError("HEIF without meta box")
    ms, me = boxes[b"meta"]
    _, _, p = _fullbox(data, ms)

    primary = None
    item_types: dict[int, bytes] = {}
    props: list[tuple[bytes, int, int]] = []
    assoc: dict[int, list[int]] = {}
    irefs: dict[bytes, list] = {}
    iloc_sizes: dict[int, int] = {}
    for t, s, e in iter_boxes(data, p, me):
        if t == b"pitm":
            v, _, q = _fullbox(data, s)
            primary = (_u32(data, q) if v else
                       int.from_bytes(data[q:q + 2], "big"))
        elif t == b"iinf":
            v, _, q = _fullbox(data, s)
            n = (int.from_bytes(data[q:q + 2], "big") if v == 0
                 else _u32(data, q))
            q += 2 if v == 0 else 4
            for it, is_, ie_ in iter_boxes(data, q, e):
                if it != b"infe":
                    continue
                iv, _, iq = _fullbox(data, is_)
                if iv >= 2:
                    iid = (int.from_bytes(data[iq:iq + 2], "big")
                           if iv == 2 else _u32(data, iq))
                    iq += 2 if iv == 2 else 4
                    iq += 2  # protection index
                    item_types[iid] = data[iq:iq + 4]
            del n
        elif t == b"iprp":
            ipco = _find(data, s, e, b"ipco")
            if ipco:
                for pt, ps, pe in iter_boxes(data, ipco[0], ipco[1]):
                    props.append((pt, ps, pe))
            ipma = _find(data, s, e, b"ipma")
            if ipma:
                v, flags, q = _fullbox(data, ipma[0])
                n = _u32(data, q)
                q += 4
                for _ in range(n):
                    if v < 1:
                        iid = int.from_bytes(data[q:q + 2], "big")
                        q += 2
                    else:
                        iid = _u32(data, q)
                        q += 4
                    cnt = data[q]
                    q += 1
                    idxs = []
                    for _ in range(cnt):
                        if flags & 1:
                            idxs.append(
                                int.from_bytes(data[q:q + 2], "big")
                                & 0x7FFF)
                            q += 2
                        else:
                            idxs.append(data[q] & 0x7F)
                            q += 1
                    assoc[iid] = idxs
        elif t == b"iref":
            v, _, q = _fullbox(data, s)
            idw = 2 if v == 0 else 4
            for rt, rs, re_ in iter_boxes(data, q, e):
                from_id = int.from_bytes(data[rs:rs + idw], "big")
                cnt = int.from_bytes(data[rs + idw:rs + idw + 2], "big")
                tos = [
                    int.from_bytes(
                        data[rs + idw + 2 + i * idw:
                             rs + idw + 2 + (i + 1) * idw], "big")
                    for i in range(cnt)
                ]
                irefs.setdefault(rt, []).append((from_id, tos))
        elif t == b"iloc":
            v, _, q = _fullbox(data, s)
            sizes_b = data[q]
            offset_size = sizes_b >> 4
            length_size = sizes_b & 0xF
            base_b = data[q + 1]
            base_offset_size = base_b >> 4
            index_size = (base_b & 0xF) if v in (1, 2) else 0
            q += 2
            if v < 2:
                cnt = int.from_bytes(data[q:q + 2], "big")
                q += 2
            else:
                cnt = _u32(data, q)
                q += 4
            for _ in range(cnt):
                if v < 2:
                    iid = int.from_bytes(data[q:q + 2], "big")
                    q += 2
                else:
                    iid = _u32(data, q)
                    q += 4
                if v in (1, 2):
                    q += 2  # construction method
                q += 2  # data reference index
                q += base_offset_size
                ext_n = int.from_bytes(data[q:q + 2], "big")
                q += 2
                total = 0
                for _ in range(ext_n):
                    q += index_size + offset_size
                    total += int.from_bytes(
                        data[q:q + length_size], "big")
                    q += length_size
                iloc_sizes[iid] = total

    if primary is None:
        raise Mp4BoxError("HEIF without pitm (primary item)")
    codec_map = {b"av01": "av01", b"hvc1": "hevc", b"hev1": "hevc"}
    ptype = item_types.get(primary)
    codec = codec_map.get(ptype)
    coded_ids = [primary]
    if codec is None and ptype == b"grid":
        # derived image: codec and coded bytes come from the tiles
        for from_id, tos in irefs.get(b"dimg", []):
            if from_id == primary:
                coded_ids = tos
                for t_ in tos:
                    codec = codec_map.get(item_types.get(t_))
                    if codec:
                        break
                break
    info = {
        "format": fmt, "width": 0, "height": 0, "bit_depth": 0,
        "rotation": 0, "has_alpha": False,
        "codec": codec,
        "n_items": len(item_types),
        "primary_item_bytes": sum(
            iloc_sizes.get(i, 0) for i in coded_ids
        ),
    }
    # Properties of the PRIMARY item via ipma (1-based into ipco).
    aux_alpha_idx = set()
    for i, (pt, ps, pe) in enumerate(props, 1):
        # AVIF spells the urn with "alpha"; HEVC's is
        # urn:mpeg:hevc:2015:auxid:1 (alpha is aux type 1).
        if pt == b"auxC" and (b"alpha" in data[ps:pe]
                              or b"auxid:1" in data[ps:pe]):
            aux_alpha_idx.add(i)
    for idx in assoc.get(primary, []):
        if not 1 <= idx <= len(props):
            continue
        pt, ps, pe = props[idx - 1]
        if pt == b"ispe":
            _, _, q = _fullbox(data, ps)
            info["width"] = _u32(data, q)
            info["height"] = _u32(data, q + 4)
        elif pt == b"pixi":
            _, _, q = _fullbox(data, ps)
            if data[q]:
                info["bit_depth"] = data[q + 1]
        elif pt == b"irot":
            info["rotation"] = (data[ps] & 3) * 90
    # Alpha: any OTHER item associated with an alpha auxC property.
    for iid, idxs in assoc.items():
        if iid != primary and aux_alpha_idx.intersection(idxs):
            info["has_alpha"] = True
    return info


# Committed libheif-encoded conformance streams (x265 HEIC, aom
# AVIF): every field heif_info reports on them was verified against
# the system libheif's own handle properties
# (tests/test_heif_interop.py); they anchor the known-answer tests
# and the multimodal_heif_metadata_oracle registry row without the
# library.
HEIF_CONFORMANCE_STREAMS = {
    "avif_rgb": (
        b'AAAAHGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZgAAAOptZXRhAAAAAAAAACFoZGxy'
        b'AAAAAAAAAABwaWN0AAAAAAAAAAAAAAAAAAAAAA5waXRtAAAAAAABAAAAImlsb2MA'
        b'AAAAREAAAQABAAAAAAEOAAEAAAAAAAAAZwAAACNpaW5mAAAAAAABAAAAFWluZmUC'
        b'AAAAAAEAAGF2MDEAAAAAamlwcnAAAABLaXBjbwAAABNjb2xybmNseAACAAIABoAA'
        b'AAAMYXYxQ4EADAAAAAAUaXNwZQAAAAAAAAA+AAAALgAAABBwaXhpAAAAAAMICAgA'
        b'AAAXaXBtYQAAAAAAAAABAAEEgYIDhAAAAG9tZGF0EgAKCRgVfbWCBAQNCDJYFMAE'
        b'EEEEAL/Za2IuYuzCfbEQ/hPF+vxaTaZm/9kVRn2sRP9ymE2/ij2We2HAD1TcHgX/'
        b'1Y3xdD03elJ7rMoV5JPt2XmCcNH//af9s9vJVDd2i/qva9YKNw=='
    ),
    "avif_alpha": (
        b'AAAAHGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZgAAAZhtZXRhAAAAAAAAACFoZGxy'
        b'AAAAAAAAAABwaWN0AAAAAAAAAAAAAAAAAAAAAA5waXRtAAAAAAABAAAANGlsb2MA'
        b'AAAAREAAAgACAAAAAAG8AAEAAAAAAAAAIAABAAAAAAHcAAEAAAAAAAAAZwAAADhp'
        b'aW5mAAAAAAACAAAAFWluZmUCAAAAAAEAAGF2MDEAAAAAFWluZmUCAAAAAAIAAGF2'
        b'MDEAAAAA12lwcnAAAACxaXBjbwAAABNjb2xybmNseAACAAIABoAAAAAMYXYxQ4EA'
        b'HAAAAAAUaXNwZQAAAAAAAAA+AAAALgAAAA5waXhpAAAAAAEIAAAAOGF1eEMAAAAA'
        b'dXJuOm1wZWc6bXBlZ0I6Y2ljcDpzeXN0ZW1zOmF1eGlsaWFyeTphbHBoYQAAAAAM'
        b'YXYxQ4EADAAAAAAUaXNwZQAAAAAAAAA+AAAALgAAABBwaXhpAAAAAAMICAgAAAAe'
        b'aXBtYQAAAAAAAAACAAEEgYYHiAACBIIDhIUAAAAaaXJlZgAAAAAAAAAOYXV4bAAC'
        b'AAEAAQAAAI9tZGF0EgAKBhgVfbWFQDIUFMAQQQC4BIq+iHNk6Se12j4mVl4SAAoJ'
        b'GBV9tYIEBA0IMlgUwAQQQQQAv9lrYi5i7MJ9sRD+E8X6/FpNpmb/2RVGfaxE/3KY'
        b'Tb+KPZZ7YcAPVNweBf/VjfF0PTd6UnusyhXkk+3ZeYJw0f/9p/2z28lUN3aL+q9r'
        b'1go3'
    ),
    "heic_rgb": (
        b'AAAAHGZ0eXBoZWljAAAAAG1pZjFoZWljbWlhZgAAAa1tZXRhAAAAAAAAACFoZGxy'
        b'AAAAAAAAAABwaWN0AAAAAAAAAAAAAAAAAAAAAA5waXRtAAAAAAACAAAAEGlkYXQA'
        b'AAAAAD4ALgAAADhpbG9jAQAAAERAAAIAAQAAAAAAAAHRAAEAAAAAAAAA4AACAAEA'
        b'AAAAAAAAAQAAAAAAAAAIAAAAOGlpbmYAAAAAAAIAAAAVaW5mZQIAAAEAAQAAaHZj'
        b'MQAAAAAVaW5mZQIAAAAAAgAAZ3JpZAAAAADYaXBycAAAALZpcGNvAAAAdmh2Y0MB'
        b'A3AAAAAAAAAAAAAe8AD8/fj4AAAPAyAAAQAYQAEMAf//A3AAAAMAkAAAAwAAAwAe'
        b'ugJAIQABACpCAQEDcAAAAwCQAAADAAADAB6gIIEFlurkprm4EBAwIAAAAwAgAAAD'
        b'ACEiAAEABkQBwXPAiQAAABRpc3BlAAAAAAAAAEAAAABAAAAAFGlzcGUAAAAAAAAA'
        b'PgAAAC4AAAAQcGl4aQAAAAADCAgIAAAAGmlwbWEAAAAAAAAAAgABAoECAAICA4QA'
        b'AAAaaXJlZgAAAAAAAAAOZGltZwACAAEAAQAAAOhtZGF0AAAA3CgBrw7gV5raUkIo'
        b'3olzeqSd2pf9Owm+NiwbO/D8+NWJ93EIW18lLkbUT7MInQM/bdTwP2S/jAyEx5DM'
        b'aza5SjJurXvXHjR7MrVtpdaqDJU0HEo2b2uSXmqraItQrnX5eHfczHtqWMhLpjb3'
        b'I1YM4Lbfc+cFg6aVvEQMzG6/kK95JiobkSL3LNu1vSGAGe3o388yySjMwwMYuR0D'
        b'Smk+6JH1zzOplYVQ2p5P3StTD3vwXQD409LDCLeo4Xs3Gn4QFIJav6plYONLMyY5'
        b'9nIQKbWnuPM3cmHlFQ6ZyKw='
    ),
    "heic_alpha": (
        b'AAAAHGZ0eXBoZWljAAAAAG1pZjFoZWljbWlhZgAAAvxtZXRhAAAAAAAAACFoZGxy'
        b'AAAAAAAAAABwaWN0AAAAAAAAAAAAAAAAAAAAAA5waXRtAAAAAAACAAAAGGlkYXQA'
        b'AAAAAD4ALgAAAAAAPgAuAAAAYGlsb2MBAAAAREAABAABAAAAAAAAAyAAAQAAAAAA'
        b'AADgAAIAAQAAAAAAAAABAAAAAAAAAAgAAwAAAAAAAAQAAAEAAAAAAAAANgAEAAEA'
        b'AAAAAAAAAQAAAAgAAAAIAAAAYmlpbmYAAAAAAAQAAAAVaW5mZQIAAAEAAQAAaHZj'
        b'MQAAAAAVaW5mZQIAAAAAAgAAZ3JpZAAAAAAVaW5mZQIAAAEAAwAAaHZjMQAAAAAV'
        b'aW5mZQIAAAAABAAAZ3JpZAAAAAGxaXBycAAAAYRpcGNvAAAAdmh2Y0MBA3AAAAAA'
        b'AAAAAAAe8AD8/fj4AAAPAyAAAQAYQAEMAf//A3AAAAMAkAAAAwAAAwAeugJAIQAB'
        b'ACpCAQEDcAAAAwCQAAADAAADAB6gIIEFlurkprm4EBAwIAAAAwAgAAADACEiAAEA'
        b'BkQBwXPAiQAAABRpc3BlAAAAAAAAAEAAAABAAAAAFGlzcGUAAAAAAAAAPgAAAC4A'
        b'AAAQcGl4aQAAAAADCAgIAAAAcWh2Y0MBBAgAAAAAAAAAAAAe8AD8/Pj4AAAPAyAA'
        b'AQAXQAEMAf//BAgAAAMAn/gAAAMAAB66AkAhAAEAJkIBAQQIAAADAJ/4AAADAAAe'
        b'wIIEFlurkprmwIAAAAMAgAAAAwCEIgABAAZEAcFzwIkAAAAUaXNwZQAAAAAAAABA'
        b'AAAAQAAAABRpc3BlAAAAAAAAAD4AAAAuAAAADnBpeGkAAAAAAQgAAAAnYXV4QwAA'
        b'AAB1cm46bXBlZzpoZXZjOjIwMTU6YXV4aWQ6MQAAAAAlaXBtYQAAAAAAAAAEAAEC'
        b'gQIAAgIDhAADAoUGAAQDB4iJAAAANmlyZWYAAAAAAAAADmRpbWcAAgABAAEAAAAO'
        b'ZGltZwAEAAEAAwAAAA5hdXhsAAQAAQACAAABHm1kYXQAAADcKAGvDuBXmtpSQije'
        b'iXN6pJ3al/07Cb42LBs78Pz41Yn3cQhbXyUuRtRPswidAz9t1PA/ZL+MDITHkMxr'
        b'NrlKMm6te9ceNHsytW2l1qoMlTQcSjZva5Jeaqtoi1Cudfl4d9zMe2pYyEumNvcj'
        b'Vgzgtt9z5wWDppW8RAzMbr+Qr3kmKhuRIvcs27W9IYAZ7ejfzzLJKMzDAxi5HQNK'
        b'aT7okfXPM6mVhVDank/dK1MPe/BdAPjT0sMIt6jhezcafhAUglq/qmVg40szJjn2'
        b'chAptae48zdyYeUVDpnIrAAAADIoAa4dwIsQ7sX7N+BS2z/jJ/d9+TE85BiJpdxb'
        b'+B9Vcp9XQr9vf0L/DOANrD7AybjoTw=='
    ),
}
