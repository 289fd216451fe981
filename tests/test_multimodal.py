"""Multimodal column plumbing tests (decode stubbed — the container
has no media codecs; the Spark-side schema/batching/partitioning is
what's under test)."""

from __future__ import annotations

import pytest

from ella_spark.operators.multimodal import (
    extract_features,
    fake_decoder,
    media_schema,
    media_stats,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"imagebytes-aaaa", ("image", 640, 480, None, None, "png")),
        (2, b"imagebytes-bbbb", ("image", 800, 600, None, None, "jpg")),
        (3, b"audiobytes-cccc", ("audio", None, None, 44100, None, "wav")),
        (4, b"videobytes-dddd", ("video", 1920, 1080, None, 95, "h264")),
        (5, None, ("image", 10, 10, None, None, "png")),
    ]
    return spark.createDataFrame(rows, media_schema()).repartition(2)


def test_extract_features(media):
    out = extract_features(media).toPandas().set_index("media_id")
    assert len(out) == 5
    assert len(out.loc[1, "features"]) == 8
    # deterministic: same payload -> same features
    assert list(out.loc[1, "features"]) == fake_decoder(b"imagebytes-aaaa")
    assert out.loc[5, "features"] is None


def test_resize_plumbing(media):
    out = resize_images(media, 64, 32).toPandas().set_index("media_id")
    assert (out["width"] == 64).all() and (out["height"] == 32).all()
    assert out.loc[1, "payload"] is not None


def test_sample_frames(media):
    out = sample_frames(media, every_n=10).toPandas()
    assert set(out.media_id) == {4}
    assert list(out.frame_idx) == list(range(0, 95, 10))


def test_media_stats_prunes_payload(media):
    df = media_stats(media)
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = df.toPandas().set_index("kind")
    assert out.loc["image", "n_items"] == 3
    assert out.loc["video", "avg_frames"] == 95.0


def test_feature_pipeline_to_ann(media, spark):
    """Features from media feed straight into the ANN operator —
    multimodal + similarity compose."""
    import pyspark.sql.functions as F

    from ella_spark.operators.similarity import brute_force_topk

    feats = extract_features(media).where(F.col("features").isNotNull())
    feats = feats.select(F.col("media_id").alias("vec_id"), F.col("features").alias("embedding"))
    out = brute_force_topk(feats, feats.where(F.col("vec_id") == 1), k=2).toPandas()
    assert list(out["rank"]) == [1, 2]
