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


def test_real_decoder_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="pillow|decode"):
        decode_image(media)


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
