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


def test_window_audio_grid_and_features(media, spark):
    """Audio rows explode into the hop-spaced window grid (pure JVM);
    the per-window featurizer is deterministic in (payload, start),
    so overlapping windows of the same clip differ while re-runs are
    identical; non-audio rows are excluded; features are fixed-dim."""
    from ella_spark.operators.multimodal import media_schema, window_audio

    rows = [
        # 3 s clip at 44.1 kHz (n_frames = samples for audio)
        (1, b"clip-one-bytes", ("audio", None, None, 44100, 44100 * 3, "wav")),
        # 1 s clip: exactly one window
        (2, b"clip-two-bytes", ("audio", None, None, 16000, 16000, "wav")),
        # non-audio rows are excluded from the grid
        (3, b"imagebytes", ("image", 640, 480, None, None, "png")),
    ]
    df = spark.createDataFrame(rows, media_schema()).repartition(2)

    out = window_audio(df, window_ms=1000, hop_ms=500).toPandas()
    assert set(out.columns) == {"media_id", "window_idx", "start_ms", "features"}
    assert set(out.media_id) == {1, 2}  # image row excluded
    one = out[out.media_id == 1].sort_values("window_idx")
    # 3000 ms clip, 1000 ms window, 500 ms hop -> starts 0..2000 = 5
    assert list(one.start_ms) == [0, 500, 1000, 1500, 2000]
    assert len(out[out.media_id == 2]) == 1  # 1 s clip: single window
    # features: fixed 8-dim, start-dependent, deterministic re-run
    assert all(len(f) == 8 for f in out.features)
    assert list(one.features.iloc[0]) != list(one.features.iloc[1])
    again = window_audio(df, window_ms=1000, hop_ms=500).toPandas()
    a = out.sort_values(["media_id", "window_idx"]).reset_index(drop=True)
    b = again.sort_values(["media_id", "window_idx"]).reset_index(drop=True)
    assert a.equals(b)
