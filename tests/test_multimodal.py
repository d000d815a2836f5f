"""Multimodal plumbing: schemas, mapInPandas batch shapes, fan-out, and the
strict-decoder seam (real codecs aren't installed; the fake decoder is
deterministic by content hash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from quickb_spark.ops.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    media_repartition,
    media_table,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return media_table(spark, n=60, seed=42).cache()


def test_media_table_schema(media):
    assert media.schema == MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_features_deterministic(media):
    a = {r["media_id"]: r["embedding"] for r in decode_features(media, dim=16).collect()}
    b = {
        r["media_id"]: r["embedding"]
        for r in decode_features(media.repartition(7), dim=16).collect()
    }
    assert a == b  # content-hash seeded: stable across partitionings
    assert len(a) == 60
    assert all(len(v) == 16 for v in a.values())


def test_decode_small_batch_rechunk(media):
    # batch_rows smaller than the Arrow batch exercises the re-chunk loop
    out = decode_features(media, dim=8, batch_rows=3).count()
    assert out == 60


def test_resize_only_images(media):
    rows = resize_images(media, max_side=64).collect()
    img_count = media.filter(F.col("kind") == "image").count()
    assert len(rows) == img_count
    for r in rows:
        assert max(r["width"], r["height"]) <= 64
        assert len(r["payload"]) >= 1


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_ms=1000, max_frames=4)
    per_vid = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    vids = media.filter(F.col("kind") == "video").count()
    assert len(per_vid) == vids
    assert all(1 <= n <= 4 for n in per_vid.values())
    # frame_ms is the sample timestamp grid
    one = frames.filter(F.col("frame_idx") == 1).select("frame_ms").distinct().collect()
    assert all(r["frame_ms"] == 1000 for r in one)


def test_strict_decoder_raises(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media, decoder="strict").collect()


def test_media_repartition_by_bytes(media):
    df = media_repartition(media, target_bytes=16 << 10)
    assert df.rdd.getNumPartitions() >= 2
