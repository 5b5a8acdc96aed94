"""Multimodal plumbing tests: schema, batch shape, error capture,
partition preservation, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark import multimodal as mm


@pytest.fixture(scope="module")
def images(spark):
    return mm.generate_media(spark, 40, "image", partitions=4).cache()


def test_generate_schema_and_determinism(spark, images):
    assert [f.name for f in images.schema.fields] == ["media_id", "metadata", "payload"]
    assert images.schema["metadata"].dataType == mm.MEDIA_METADATA_SCHEMA
    again = mm.generate_media(spark, 40, "image", partitions=2)
    a = {r.media_id: bytes(r.payload) for r in images.collect()}
    b = {r.media_id: bytes(r.payload) for r in again.collect()}
    assert a == b  # content independent of partitioning


def test_decode_images(images):
    decoded = mm.decode_images(images)
    rows = decoded.collect()
    assert len(rows) == 40
    assert all(r.ok == "ok" for r in rows)
    meta = {r.media_id: r for r in images.select("media_id", "metadata.*").collect()}
    for r in rows:
        assert r.width == meta[r.media_id].width
        assert r.height == meta[r.media_id].height
        assert 0.0 <= r.mean_pixel <= 255.0


def test_decode_captures_corrupt_rows(spark, images):
    corrupt = images.withColumn(
        "payload",
        F.when(F.col("media_id") == "image-3", F.lit(b"JPEG-not-supported")).otherwise(
            F.col("payload")
        ),
    )
    rows = {r.media_id: r for r in mm.decode_images(corrupt).collect()}
    assert rows["image-3"].ok == "NotImplementedError"
    assert rows["image-3"].width is None
    assert sum(1 for r in rows.values() if r.ok == "ok") == 39


def test_resize_roundtrip(images):
    resized = mm.resize_images(images, 8, 8)
    assert resized.schema["payload"].dataType.typeName() == "binary"
    decoded = mm.decode_images(resized)
    rows = decoded.collect()
    assert all(r.width == 8 and r.height == 8 and r.ok == "ok" for r in rows)


def test_byte_features_shape(images):
    feats = mm.extract_byte_features(images, n_bins=16)
    row = feats.select("features").first()
    assert len(row.features) == 16
    assert abs(sum(row.features) - 1.0) < 1e-5


def test_feature_pipeline_preserves_partitioning(images):
    # mapInPandas must not introduce a shuffle: partition count is preserved.
    feats = mm.extract_byte_features(images)
    assert feats.rdd.getNumPartitions() == images.rdd.getNumPartitions()


def test_video_frame_sampling(spark):
    videos = mm.generate_media(spark, 10, "video")
    frames = mm.sample_video_frames(videos, every_nth=2)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    nf = {r.media_id: r.n_frames for r in videos.select("media_id", "metadata.n_frames").collect()}
    for r in got:
        expect = (nf[r.media_id] + 1) // 2
        assert r.n == expect
    f0 = frames.filter(F.col("frame_index") == 0).first()
    assert len(bytes(f0.frame)) == 64


def test_audio_features(spark):
    audio = mm.generate_media(spark, 12, "audio")
    feats = mm.extract_byte_features(audio)
    assert feats.count() == 12
    assert all(len(r.features) == 16 for r in feats.select("features").collect())
