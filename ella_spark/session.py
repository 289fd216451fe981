"""SparkSession construction and configuration for ella_spark.

The reference engine builds one DataFusion ``SessionState`` per
datastore (ella-engine/src/engine/state.rs:115-133). Here the analog
is a configured SparkSession. Unlike the reference — which pins
everything to a single partition and disables repartitioning
(state.rs:128-130) — we deliberately enable Spark's distributed
machinery (AQE, shuffle partitioning, broadcast joins): that is the
whole point of the rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that must be set for correctness (not just performance).
REQUIRED_CONFS = {
    # The reference stores time as nanosecond timestamps
    # (ella-common/src/time.rs:28-45). Spark's TimestampType is µs;
    # reading parquet TIMESTAMP(NANOS) columns as LongType (epoch ns)
    # is lossless and orderable (SURVEY.md §1.4).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics for the duckdb oracle.
    "spark.sql.session.timeZone": "UTC",
}

# Performance configs — tuned for local[N] testing but chosen so the
# same plan shape scales to a large cluster (AQE re-plans at runtime).
PERF_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas interchange (toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # At 100 TB these would be sized per-cluster; on local[32] against
    # sf<=0.1 a modest shuffle fan-out avoids tiny-task overhead while
    # AQE coalesces further.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.files.maxPartitionBytes": "128MB",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an externally-provided session.

    The verify driver hands us its own SparkSession; these are all
    runtime-settable SQL confs.
    """
    for k, v in {**REQUIRED_CONFS, **PERF_CONFS}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static confs on a running session — ignore; defaults are
            # acceptable for everything except REQUIRED_CONFS, which
            # are all runtime-settable.
            pass
    return spark


def get_session(app_name: str = "ella_spark", master: str | None = None) -> SparkSession:
    """Build (or get) a SparkSession with ella_spark defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in {**REQUIRED_CONFS, **PERF_CONFS}.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    spark = builder.getOrCreate()
    return configure(spark)
