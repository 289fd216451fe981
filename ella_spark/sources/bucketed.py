"""Bucketed table layout: co-located, shuffle-free joins at scale.

The reference is single-partition and never shuffles (SURVEY.md §4.2);
on Spark the equivalent *design obligation* is making the unavoidable
shuffles cheap. For repeated fact-fact joins (lineitem ⋈ orders on
orderkey at 100 TB) the winning layout is hash-bucketed storage: both
tables pre-partitioned into the same number of buckets on the join
key, so Catalyst plans the join with ZERO Exchange nodes — each task
joins bucket i of A against bucket i of B. The one-time bucketing
write replaces a shuffle **per query** with one at load time.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    managed table and return the bucketed scan.

    ``sort_cols`` = the join/group keys lets sort-merge join skip its
    Sort as well; with both sides bucketized on the same keys and
    bucket count, `.explain` shows no Exchange under the join.
    """
    spark = df.sparkSession
    # idempotent: a previous session's managed-table directory may
    # survive without a metastore entry — clear both
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    leftover = Path(warehouse) / table_name.lower()
    if leftover.exists():
        shutil.rmtree(leftover, ignore_errors=True)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True when the physical plan contains a join with no shuffle
    Exchange (the bucketed co-location check used in tests/audits).

    BroadcastExchange is allowed — it moves one small side, not the
    bucketed data; the property bucketing buys is the absence of
    hash-partition shuffles of the big tables."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Join" in plan and "Exchange hashpartitioning" not in plan


def colocated_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    names: tuple[str, str] = ("_bkt_left", "_bkt_right"),
    num_buckets: int = 32,
) -> DataFrame:
    """One-shot helper: bucketize both sides on ``keys`` and return the
    shuffle-free equi-join."""
    lt = bucketize(left, names[0], keys, num_buckets, sort_cols=keys)
    rt = bucketize(right, names[1], keys, num_buckets, sort_cols=keys)
    return lt.join(rt, keys)
