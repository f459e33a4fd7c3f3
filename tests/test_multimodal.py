"""Multimodal plumbing: schema, mapInPandas batching, determinism.

The decode kernels are stubbed (no codec libs in this environment), but
the Spark-side plumbing — binary columns, Arrow batch shape, output
schemas, partitioning — is real and tested (SURVEY/BASELINE multimodal
requirement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (f"m{i}", "image", bytes([i]) * 64, None, None, None, "png")
        for i in range(20)
    ] + [
        (f"v{i}", "video", bytes([100 + i]) * 64, None, None, 3500, "mp4")
        for i in range(3)
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).repartition(4)


def test_not_implemented_without_fake(media_df):
    with pytest.raises(NotImplementedError):
        extract_image_features(media_df)
    with pytest.raises(NotImplementedError):
        sample_video_frames(media_df)


def test_image_features_shape_and_determinism(media_df):
    out = extract_image_features(media_df, feature_dim=8, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 23
    r = rows["m0"]
    assert len(r["feature"]) == 8
    assert 64 <= r["width"] <= 319 and 64 <= r["height"] <= 319
    assert 0.0 <= r["mean_luma"] <= 1.0
    # deterministic: second run identical
    rows2 = {r["media_id"]: r for r in
             extract_image_features(media_df, feature_dim=8, fake=True).collect()}
    assert rows["m1"]["feature"] == rows2["m1"]["feature"]


def test_video_frame_sampling(media_df):
    out = sample_video_frames(
        media_df.where(F.col("media_type") == "video"),
        every_ms=1000,
        fake=True,
    )
    rows = out.collect()
    # 3500ms at 1000ms stride -> ts 0,1000,2000,3000 per video
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r["ts_ms"])
    assert all(sorted(v) == [0, 1000, 2000, 3000] for v in by_vid.values())
    assert all(len(r["frame"]) == 32 for r in rows)


def test_media_binary_column_prunable(spark, media_df, tmp_path):
    """The binary payload must not be read when only metadata is queried —
    the core reason media rides as an opaque column."""
    from pinecone_datasets_spark.plans.explain import scan_read_schema

    path = str(tmp_path / "media")
    media_df.write.parquet(path)
    df = spark.read.parquet(path).select("media_id", "media_type")
    read = scan_read_schema(df)
    assert "content" not in read
