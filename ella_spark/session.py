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
import tempfile

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
    # Compaction unlinks merged-away shards; a batch scan whose file
    # index listed them moments earlier must skip, not fail, on the
    # vanished files (compact_topic's reader contract).
    "spark.sql.files.ignoreMissingFiles": "true",
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
    # Spark's default 10MB: fact tables must never auto-broadcast (at
    # sf0.1 lineitem is 10.5MB and a 64MB threshold made Spark
    # broadcast-build the FACT side of q3/q5 — slow locally, and the
    # wrong plan shape to be validating for scale). True dimension
    # tables are broadcast explicitly (sources.BROADCAST_TABLES).
    "spark.sql.autoBroadcastJoinThreshold": "10MB",
    "spark.sql.files.maxPartitionBytes": "128MB",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an externally-provided session.

    The verify driver hands us its own SparkSession; these are all
    runtime-settable SQL confs. Also ships the ella_spark package to
    executor Python workers (addPyFile) so Pandas-UDF / mapInPandas
    closures that reference this module deserialize on workers even
    when the application was launched outside the repo directory.
    """
    for k, v in {**REQUIRED_CONFS, **PERF_CONFS}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static confs on a running session — ignore; defaults are
            # acceptable for everything except REQUIRED_CONFS, which
            # are all runtime-settable.
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    sc = getattr(spark, "sparkContext", None)
    if sc is None:  # Spark Connect session: workers resolve via artifacts
        return
    if getattr(sc, "_ella_spark_shipped", False):
        return
    try:
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_path = os.path.join(
            tempfile.gettempdir(), f"ella_spark_pkg_{os.getpid()}.zip"
        )
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w") as zf:
                for base, _dirs, files in os.walk(pkg_dir):
                    for fn in files:
                        if not fn.endswith(".py"):
                            continue
                        full = os.path.join(base, fn)
                        rel = os.path.join(
                            "ella_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        sc.addPyFile(zip_path)
        sc._ella_spark_shipped = True
    except Exception:
        # Non-fatal: JVM-only plans never need it; worker-side imports
        # still work when the app itself runs from the repo directory.
        pass


def get_session(app_name: str = "ella_spark", master: str | None = None) -> SparkSession:
    """Build (or get) a SparkSession with ella_spark defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in {**REQUIRED_CONFS, **PERF_CONFS}.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.ui.enabled", "false")
    # managed-table warehouse (bucketed layouts) outside the repo tree
    builder = builder.config(
        "spark.sql.warehouse.dir",
        os.environ.get(
            "SPARK_GRAFT_WAREHOUSE",
            os.path.join(tempfile.gettempdir(), "ella_spark_warehouse"),
        ),
    )
    # 32 concurrent task threads share one driver heap in local mode;
    # 16g keeps GC pauses out of the query timings (128 GiB available).
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    spark = builder.getOrCreate()
    return configure(spark)
