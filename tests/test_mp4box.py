"""MP4 / ISO-BMFF container metadata (ops/mp4box.py): box walk,
version-0/1 forms, sample tables, keyframe rules, malformed payloads."""

from __future__ import annotations

import struct

import pytest

from sqlpp_spark.ops.mp4box import (
    Mp4BoxError,
    encode_mp4,
    iter_boxes,
    mp4_info,
    sample_decode_time,
)


def test_sample_decode_time_mixed_deltas():
    """Cumulative stts walk (14496-12 §8.6.1.2): mixed-delta tables
    give exact per-sample times, where the old average-delta
    approximation was wrong for every sample after the first run."""
    runs = [(3, 10), (2, 50), (4, 5)]
    # decode times: s1=0 s2=10 s3=20 s4=30 s5=80 s6=130 s7=135 ...
    expect = [0, 10, 20, 30, 80, 130, 135, 140, 145]
    assert [sample_decode_time(runs, k) for k in range(1, 10)] == expect
    # beyond the table clamps to its end
    assert sample_decode_time(runs, 99) == 150
    # uniform table reduces to (k-1)*delta
    assert sample_decode_time([(10, 40)], 7) == 240


def test_mp4_mixed_delta_stts_roundtrip():
    b = encode_mp4(64, 48, 9, 40, 4, stts_runs=[(3, 10), (2, 50), (4, 5)])
    t = mp4_info(b)["tracks"][0]
    assert t["n_samples"] == 9
    assert t["total_delta"] == 3 * 10 + 2 * 50 + 4 * 5
    assert t["stts_entries"] == [(3, 10), (2, 50), (4, 5)]


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize(
    "w,h,n,ke", [(320, 240, 30, 10), (16, 16, 1, 1), (1920, 1080, 29, 7)]
)
def test_mp4_roundtrip_matrix(version, w, h, n, ke):
    b = encode_mp4(w, h, n, 40, ke, version=version)
    info = mp4_info(b)
    assert info["brand"] == "isom"
    assert info["timescale"] == 1000
    assert info["duration_ms"] == n * 40
    (t,) = info["tracks"]
    assert (t["width"], t["height"]) == (w, h)
    assert (t["coded_width"], t["coded_height"]) == (w, h)
    assert t["codec"] == "avc1" and t["handler"] == "vide"
    assert t["n_samples"] == n and t["total_delta"] == n * 40
    assert t["keyframes"] == list(range(1, n + 1, ke))
    assert t["sample_bytes"] == sum(100 + i for i in range(n))


def test_mp4_largesize_and_size0_boxes():
    """64-bit largesize headers and size-0 (to-EOF) boxes walk
    correctly (14496-12 §4.2)."""
    payload = b"x" * 10
    large = struct.pack(">I", 1) + b"abcd" + struct.pack(">Q", 16 + 10) + payload
    to_eof = struct.pack(">I", 0) + b"wxyz" + payload
    boxes = list(iter_boxes(large + to_eof))
    assert [t for t, _, _ in boxes] == [b"abcd", b"wxyz"]
    (t1, s1, e1), (t2, s2, e2) = boxes
    assert e1 - s1 == 10 and e2 - s2 == 10


def test_mp4_no_stss_means_every_sample_is_keyframe():
    """Spec 8.6.2: absent sync-sample table => all samples sync."""
    b = encode_mp4(64, 64, 7, 40, 1)
    # strip the stss box: rebuild without it by parsing + deleting
    idx = b.find(b"stss")
    assert idx > 0
    size = struct.unpack(">I", b[idx - 4 : idx])[0]
    stripped = b[: idx - 4] + b[idx - 4 + size :]
    # fix the enclosing stbl/minf/mdia/trak/moov sizes
    for btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = stripped.find(btype)
        old = struct.unpack(">I", stripped[j - 4 : j])[0]
        stripped = (
            stripped[: j - 4]
            + struct.pack(">I", old - size)
            + stripped[j:]
        )
    t = mp4_info(stripped)["tracks"][0]
    assert t["keyframes"] == [1, 2, 3, 4, 5, 6, 7]


def test_mp4_malformed_payloads_raise():
    good = encode_mp4(32, 32, 5, 40, 2)
    for bad in (
        b"",
        b"\x00" * 24,
        b"\x00\x00\x00\x08ftyp",  # ftyp marker but truncated stream
        good[:40],  # cut inside moov
        good[:4] + b"free" + good[8:],  # no ftyp at position 4
    ):
        with pytest.raises(Mp4BoxError):
            mp4_info(bad)
    # a box whose declared size overruns its container
    evil = bytearray(good)
    moov_at = good.find(b"moov")
    evil[moov_at - 4 : moov_at] = struct.pack(">I", len(good) * 2)
    with pytest.raises(Mp4BoxError):
        mp4_info(bytes(evil))


def test_mp4_spark_metadata_and_plan(spark):
    """The Spark operators over a mixed frame: valid MP4s decode with
    exact metadata; junk payloads yield decoded=false (metadata) and
    no rows (plan) instead of failing the task."""
    from sqlpp_spark.ops.multimodal import mp4_keyframe_plan, mp4_metadata

    rows = [
        (1, bytearray(encode_mp4(320, 240, 10, 40, 3))),
        (2, bytearray(encode_mp4(64, 48, 4, 40, 2, version=1))),
        (3, bytearray(b"not an mp4 at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = {r.media_id: r for r in mp4_metadata(df).collect()}
    assert meta[1].decoded and (meta[1].width, meta[1].height) == (320, 240)
    assert meta[1].n_keyframes == 4  # samples 1,4,7,10
    assert meta[2].decoded and meta[2].n_samples == 4
    assert not meta[3].decoded and meta[3].n_tracks == 0
    plan = mp4_keyframe_plan(df).collect()
    by_id = {}
    for r in plan:
        by_id.setdefault(r.media_id, []).append((r.sample_no, r.sample_ms))
    assert sorted(by_id[1]) == [(1, 0), (4, 120), (7, 240), (10, 360)]
    assert sorted(by_id[2]) == [(1, 0), (3, 80)]
    assert 3 not in by_id


def test_mp4_keyframe_plan_mixed_delta_exact(spark):
    """Keyframe timestamps come from the cumulative stts walk, not an
    average delta: for runs [(3,100),(2,500),(4,50)] at timescale 1000
    sample 4 starts at t=300 and sample 7 at t=1350, while the old
    avg-delta (1700/9≈188) formula would have said 566 and 1133."""
    from sqlpp_spark.ops.multimodal import mp4_keyframe_plan

    b = encode_mp4(64, 48, 9, 40, 3,
                   stts_runs=[(3, 100), (2, 500), (4, 50)])
    df = spark.createDataFrame([(1, bytearray(b))],
                               "media_id long, payload binary")
    got = sorted((r.sample_no, r.sample_ms)
                 for r in mp4_keyframe_plan(df).collect())
    assert got == [(1, 0), (4, 300), (7, 1350)]
