from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlpp_spark.ops.multimodal import (
    decode_image,
    fake_decode,
    frame_sample_indices,
    resize_stub,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return synthesize_media(docs)


def test_media_schema(media):
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_id"] == "bigint"


def test_fake_decode_roundtrips_header(spark, media):
    feats = fake_decode(media)
    joined = media.join(feats, on="media_id")
    # header width/height must round-trip through the binary payload
    n = joined.count()
    assert n > 0
    mismatched = joined.filter(
        (media["width"] != feats["width"]) | (media["height"] != feats["height"])
    ).count()
    assert mismatched == 0
    assert feats.filter(F.col("channels") != 3).count() == 0
    assert feats.filter(F.col("mean_byte") <= 0).count() == 0


def test_decode_image_both_environments(spark, media):
    """decode_image works whether or not pillow is installed: with PIL
    it decodes real bytes (SYNM payloads still parse as synthetic, so
    output equals fake_decode on this corpus); without PIL it
    auto-falls back to the synthetic decoder. Either way the result
    must match fake_decode row for row here."""
    from sqlpp_spark.ops.multimodal import HAS_PIL

    real = {r.media_id: (r.width, r.height, r.channels, r.payload_bytes,
                         round(r.mean_byte, 9))
            for r in decode_image(media).collect()}
    fake = {r.media_id: (r.width, r.height, r.channels, r.payload_bytes,
                         round(r.mean_byte, 9))
            for r in fake_decode(media).collect()}
    assert real == fake and real
    if HAS_PIL:
        # a genuine (non-SYNM) image must decode through PIL
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (11, 7), color=(10, 20, 30)).save(buf, format="PNG")
        png = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
        )
        row = decode_image(png).collect()[0]
        assert (row.width, row.height, row.channels) == (11, 7, 3)


def test_decode_image_no_fallback_raises_without_pil(media):
    from sqlpp_spark.ops.multimodal import HAS_PIL

    if HAS_PIL:
        pytest.skip("pillow installed - stub boundary not reachable")
    with pytest.raises(NotImplementedError, match="pillow|decode"):
        decode_image(media, fallback=False)


def test_resize_metadata(media):
    r = resize_stub(media, 224, 224)
    row = r.limit(1).collect()[0]
    assert row.width == 224 and row.height == 224
    assert row.resize_scale_x > 0


def test_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 0)], "media_id long, duration_ms long"
    )
    frames = frame_sample_indices(df, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_ms)
    assert by_id[1] == [0, 1000, 2000, 3000, 4000]
    assert by_id[2] == [0]
