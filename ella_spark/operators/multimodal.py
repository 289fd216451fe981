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
