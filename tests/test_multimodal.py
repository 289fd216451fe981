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


def test_window_audio_grid_and_features(media, spark, tmp_path):
    """Grid path (featurizer=None): pure-JVM hop-spaced windows with
    NULL features and the payload column PRUNED from the scan; short
    and NULL-duration clips produce zero windows (no phantom window).
    Featurizer path: one mapInPandas row per clip emits all windows
    (payload crosses Arrow once per clip), deterministic in
    (payload, start), fixed feature dim."""
    import hashlib

    from ella_spark.operators.multimodal import media_schema, window_audio

    rows = [
        # 3 s clip at 44.1 kHz (n_frames = samples for audio)
        (1, b"clip-one-bytes", ("audio", None, None, 44100, 44100 * 3, "wav")),
        # 1 s clip: exactly one window
        (2, b"clip-two-bytes", ("audio", None, None, 16000, 16000, "wav")),
        # 300 ms clip: SHORTER than the window -> zero windows
        (3, b"clip-short", ("audio", None, None, 16000, 4800, "wav")),
        # NULL duration metadata -> zero windows (not a phantom at 0)
        (4, b"clip-nodur", ("audio", None, None, 44100, None, "wav")),
        # non-audio rows are excluded from the grid
        (5, b"imagebytes", ("image", 640, 480, None, None, "png")),
    ]
    df = spark.createDataFrame(rows, media_schema()).repartition(2)

    # grid-only path — prune check needs a FILE source (an in-memory
    # frame always carries every column); ReadSchema must lack payload
    df.write.mode("overwrite").parquet(str(tmp_path / "media.parquet"))
    fdf = spark.read.parquet(str(tmp_path / "media.parquet"))
    plan = (
        window_audio(fdf, window_ms=1000, hop_ms=500)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    read_schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert read_schemas and all("payload" not in s for s in read_schemas), plan

    grid = window_audio(df, window_ms=1000, hop_ms=500)
    out = grid.toPandas()
    assert set(out.media_id) == {1, 2}  # short/NULL-dur/image excluded
    one = out[out.media_id == 1].sort_values("window_idx")
    # 3000 ms clip, 1000 ms window, 500 ms hop -> starts 0..2000 = 5
    assert list(one.start_ms) == [0, 500, 1000, 1500, 2000]
    assert len(out[out.media_id == 2]) == 1
    assert out.features.isna().all()

    # featurizer path: same grid, payload shipped once per clip
    def feat(b: bytes, start: int, width: int) -> list[float]:
        h = hashlib.sha256(b + start.to_bytes(8, "little")).digest()
        return [x / 255.0 for x in h[:8]]

    fout = window_audio(df, window_ms=1000, hop_ms=500, featurizer=feat)
    fpdf = fout.toPandas().sort_values(["media_id", "window_idx"]).reset_index(drop=True)
    g = out.sort_values(["media_id", "window_idx"]).reset_index(drop=True)
    assert list(fpdf.media_id) == list(g.media_id)
    assert list(fpdf.start_ms) == list(g.start_ms)  # identical grid
    assert all(len(f) == 8 for f in fpdf.features)
    f1 = fpdf[fpdf.media_id == 1].features
    assert list(f1.iloc[0]) != list(f1.iloc[1])  # start-dependent
    again = (
        window_audio(df, window_ms=1000, hop_ms=500, featurizer=feat)
        .toPandas()
        .sort_values(["media_id", "window_idx"])
        .reset_index(drop=True)
    )
    assert fpdf.equals(again)
