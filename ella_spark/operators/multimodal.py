"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas iterators.

Beyond the reference's surface (ella has no media types). Design:

- media column = ``binary`` payload + struct metadata column
  (``{kind, width, height, sample_rate, n_frames, codec}``)
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow batch in → pandas out, so the Python
  work is vectorized per batch and parallel per partition. At 100 TB
  the binary column stays columnar in parquet; partition pruning and
  projection mean a metadata-only query never touches the bytes.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernel is pluggable: pass ``decoder=`` to use a real one;
the default ``fake_decoder`` is a deterministic stand-in (hash-seeded
pixel stats) that keeps the Spark-side plumbing — schema, batching,
partitioning — real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),  # image | audio | video
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("codec", StringType()),
    ]
)


def media_schema(id_col: str = "media_id") -> StructType:
    return StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("meta", MEDIA_META_SCHEMA, True),
        ]
    )


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decode+featurize kernel.

    Derives an 8-dim feature vector from the payload bytes (sha256
    expansion). Replace with a real decoder where PIL/ffmpeg exist:
    it must map bytes -> fixed-length list[float].
    """
    if payload is None:
        return None
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def real_decoder_unavailable(payload: bytes):  # pragma: no cover
    """Marker decoder for environments without media libraries."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this environment; "
        "pass decoder=fake_decoder or a real kernel"
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] = fake_decoder,
    payload_col: str = "payload",
    id_col: str = "media_id",
    feature_dim: int = 8,
) -> DataFrame:
    """Decode+featurize each media row → (id, features array<double>).

    mapInPandas: one Arrow batch at a time, vectorized pandas apply,
    output schema fixed — the scalable shape for Python-side media work
    (per-partition parallel; no driver collect).
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": pdf[payload_col].map(decoder),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize kernel plumbing: bytes -> bytes with updated metadata.

    Default resizer is a deterministic truncate/pad fake (real one
    needs PIL; same signature)."""
    if resizer is None:

        def resizer(b: bytes, w: int, h: int) -> bytes:  # noqa: F811
            if b is None:
                return None
            need = max(1, (w * h) // 64)
            return (b * (need // max(len(b), 1) + 1))[:need]

    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": pdf[payload_col].map(lambda b: resizer(b, width, height)),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: explodes frame indices
    0, n, 2n, … up to meta.n_frames — pure JVM (sequence+explode); the
    per-frame decode would chain an extract_features stage."""
    return (
        df.where(F.col("meta.kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate: never reads payload bytes (column
    pruning keeps the binary column out of the scan)."""
    return df.groupBy(F.col("meta.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.n_frames")).alias("avg_frames"),
    )


def window_audio(
    df: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    featurizer: Callable[[bytes, int, int], list[float]] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio windowing plumbing: each audio row explodes into
    overlapping (window_idx, start_ms) frames — the audio analog of
    sample_frames — and an optional per-window featurizer (bytes,
    start_ms, window_ms) -> list[float] runs as a mapInPandas stage.

    The window GRID is pure JVM (sequence+explode over duration
    derived from meta.n_frames/meta.sample_rate — frames = samples
    for audio rows); only the featurize stage touches Python, and
    only when a featurizer is passed. Default featurizer is a
    deterministic fake (payload digest + window offset), same
    signature a real librosa/ffmpeg kernel would have.

    Returns (id, window_idx, start_ms, features). 100 TB: grid
    explode is linear in total audio duration; the featurize stage is
    Arrow-batched and partition-parallel, and a metadata-only caller
    (features unused) prunes the payload column entirely.
    """
    if featurizer is None:

        def featurizer(b: bytes, start: int, width: int) -> list[float]:  # noqa: F811
            if b is None:
                return None
            h = hashlib.sha256(b + start.to_bytes(8, "little")).digest()
            return [x / 255.0 for x in h[:8]]

    dur_ms = (
        F.col("meta.n_frames").cast("long")
        * 1000
        / F.greatest(F.col("meta.sample_rate"), F.lit(1))
    ).cast("long")
    grid = (
        df.where(F.col("meta.kind") == "audio")
        .select(
            id_col,
            payload_col,
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(dur_ms - window_ms, F.lit(0)),
                    F.lit(hop_ms),
                )
            ).alias("window_idx", "start_ms"),
        )
    )
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("window_idx", IntegerType(), False),
            StructField("start_ms", LongType(), False),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "window_idx": pdf["window_idx"],
                    "start_ms": pdf["start_ms"],
                    "features": [
                        featurizer(b, int(s), window_ms)
                        for b, s in zip(pdf[payload_col], pdf["start_ms"])
                    ],
                }
            )

    return grid.mapInPandas(run, out_schema)
