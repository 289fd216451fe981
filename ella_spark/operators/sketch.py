"""Bounded-memory frequency sketches over DataFrame columns.

Spark's hash aggregate already does map-side partial counting, but its
per-task hash map grows with the number of DISTINCT keys in the task's
input and spills to disk when it doesn't fit — fine for word counts,
pathological for open-ended key spaces (all n-grams of a 100 TB
corpus, URL paths, join-key profiling). The Misra-Gries summary keeps
AT MOST ``counters`` entries per task no matter how many distinct keys
stream through, at the cost of undercounting by a bounded amount.

Guarantees (Misra-Gries '82; merge form Agarwal et al., "Mergeable
Summaries", PODS'12):

- each per-task summary undercounts any key by at most n_task/(c+1)
  where c = ``counters`` and n_task = rows seen by that task;
- summaries merge by summing counts (the union is again an MG
  summary), so the final exact groupBy over the ≤ c * n_tasks summary
  rows bounds the global undercount by n_total/(c+1);
- every key with true frequency > n_total/(c+1) is GUARANTEED present;
- when a task sees ≤ c distinct keys, no eviction ever fires and its
  counts are EXACT (so exact whenever the key space is small —
  the registry query's oracle relies on this).

The reference has no sketch operators at all (its only approximate
aggregates are DataFusion's HLL approx_distinct / approx_percentile,
SURVEY.md §2.B); this is beyond-reference surface for the
training-data-pipeline profile.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _mg_update(summary: dict[str, int], batch_counts: dict[str, int], c: int) -> None:
    """Merge exact batch counts into an MG summary of ≤ c entries."""
    for key, n in batch_counts.items():
        if key in summary:
            summary[key] += n
        else:
            summary[key] = n
    # Evict down to c entries by subtracting the (c+1)-th largest
    # count from everyone (the batched form of MG's decrement-all).
    if len(summary) > c:
        cut = sorted(summary.values(), reverse=True)[c]
        for key in list(summary):
            summary[key] -= cut
            if summary[key] <= 0:
                del summary[key]


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    counters: int = 256,
) -> DataFrame:
    """Top-k most frequent values of ``col`` via per-partition
    Misra-Gries summaries.

    Plan shape: one narrow mapInPandas pass producing ≤ ``counters``
    (value, count) rows per task, one exact aggregate over those
    summary rows (shuffle volume ≤ counters x n_tasks — independent of
    both row count and distinct-key count), TakeOrderedAndProject for
    the top-k. Counts are exact lower bounds; see module docstring for
    when they are exactly right.

    Returns (value, approx_count, rank).
    """
    field = df.schema[col]

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            counts = pdf[col].value_counts(dropna=True)
            _mg_update(summary, counts.to_dict(), counters)
        if summary:
            yield pd.DataFrame(
                {"value": list(summary), "partial": list(summary.values())}
            )

    summaries = df.select(col).mapInPandas(
        summarize, schema=f"value {field.dataType.simpleString()}, partial long"
    )
    from pyspark.sql import Window

    agg = summaries.groupBy("value").agg(F.sum("partial").alias("approx_count"))
    w = Window.orderBy(F.col("approx_count").desc(), "value")
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("value", "approx_count", "rank")
    )


def distinct_rollup(
    df: DataFrame,
    key_col: str,
    bucket_col: Column | str,
    lgk: int = 12,
) -> DataFrame:
    """Per-bucket mergeable distinct-count sketches (Apache DataSketches
    HLL via Spark's hll_sketch_agg).

    The continuous-aggregate pattern for COUNT(DISTINCT) at 100 TB:
    plain distinct counts don't merge (yesterday's count + today's
    count ≠ the two-day count), so a rollup must either rescan raw
    history per query or store sketches. Each bucket row carries a
    binary sketch; ``merge_distinct`` unions any subset of buckets to
    an estimate without touching raw data. lgk=12 → ~1.6% relative
    standard error, 4KB per sketch.

    Returns (bucket, sketch binary, per-bucket estimate).
    """
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    return (
        df.groupBy(b.alias("bucket"))
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"))
        .select(
            "bucket",
            "sketch",
            F.hll_sketch_estimate("sketch").alias("bucket_estimate"),
        )
    )


def merge_distinct(rollup: DataFrame) -> DataFrame:
    """Union bucket sketches (optionally pre-filtered to a time range)
    into one distinct-count estimate — reads sketch rows only."""
    return rollup.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_estimate")
    )
