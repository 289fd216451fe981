"""Table loading for the driver-provided test datasets.

Mirrors the reference's scan layer (ella-engine/src/table/topic/shard.rs:310-379):
there the TableProvider builds a ParquetExec with pushed-down
predicates/projection; here ``spark.read.parquet`` + Catalyst do the
same pushdown natively (PushedFilters / ReadSchema in .explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ella_spark.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-join these. At 100 TB the
# fact tables (lineitem/orders/events/documents) grow with SF but the
# dims stay broadcastable.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, applying required session confs first.

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as LongType
    epoch-ns — the reference's native time representation
    (ella-common/src/time.rs:28-45).
    """
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
