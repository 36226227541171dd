"""Multimodal plumbing tests (schema, determinism, strict-mode gating)."""

import pytest
from pyspark.sql import functions as F

from discoverx_spark.operators.multimodal import (attach_fake_media,
                                                  decode_image_features,
                                                  frame_sample, resize_stub)


@pytest.fixture(scope="module")
def media(spark):
    return attach_fake_media(spark.range(10), "id", kind="image")


def test_media_schema(media):
    assert media.columns == ["media_id", "kind", "mime", "payload",
                             "meta_width", "meta_height", "meta_duration_ms"]
    assert media.schema["payload"].dataType.simpleString() == "binary"


def test_decode_features_deterministic(media):
    a = {r["media_id"]: (r["sha256"], r["mean_byte"])
         for r in decode_image_features(media).collect()}
    b = {r["media_id"]: (r["sha256"], r["mean_byte"])
         for r in decode_image_features(media.repartition(4)).collect()}
    assert a == b and len(a) == 10


def test_strict_mode_raises_without_codec(media):
    with pytest.raises(Exception) as err:
        decode_image_features(media, strict=True).collect()
    assert "NotImplementedError" in str(err.value) or "decode" in str(err.value)


def test_frame_sample_shape(media):
    out = frame_sample(media, n_frames=4)
    assert out.columns == ["media_id", "frame_idx", "frame_sha256"]
    assert out.count() == 40
    per = out.groupBy("media_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [4]


def test_resize_stub(media):
    r = resize_stub(media, 224, 224).select("meta_width", "meta_height").first()
    assert (r["meta_width"], r["meta_height"]) == (224, 224)
