"""Custom stateful streaming operators (applyInPandasWithState).

Beyond the reference (§F: ella has NO stateful streaming — its only
state is the broadcast channel queue): Spark's arbitrary-state API
gives per-key state that survives micro-batches with checkpointed
fault tolerance. This module ships the canonical shape — per-key
running aggregates — as a reusable operator; the same pattern covers
sessionization, dedup-across-batches, and counters.

Scale notes: state lives partitioned by key in the state store (one
shard per shuffle partition); each micro-batch shuffles only that
batch's rows to their key's partition. Skewed hot keys behave like any
skewed aggregation (salt upstream if needed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ella_spark.types import TIME_COLUMN

_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("v_min", DoubleType()),
        StructField("v_max", DoubleType()),
        StructField("last_time", LongType()),
        StructField("last_v", DoubleType()),
    ]
)

_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("v_min", DoubleType()),
        StructField("v_max", DoubleType()),
        StructField("last_time", LongType()),
        StructField("last_v", DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, total = 0, 0.0
    v_min = v_max = None
    last_time, last_v = -1, None
    if state.exists:
        n, total, v_min, v_max, last_time, last_v = state.get
    for pdf in pdfs:
        if not len(pdf):
            continue
        v = pdf["_v"].astype("float64")
        t = pdf["_t"].astype("int64")
        n += len(pdf)
        total += float(v.sum())
        bmin, bmax = float(v.min()), float(v.max())
        v_min = bmin if v_min is None else min(v_min, bmin)
        v_max = bmax if v_max is None else max(v_max, bmax)
        i = int(t.idxmax())
        if int(t.loc[i]) >= last_time:
            last_time, last_v = int(t.loc[i]), float(v.loc[i])
    state.update((n, total, v_min, v_max, last_time, last_v))
    yield pd.DataFrame(
        [
            {
                "key": key[0],
                "n": n,
                "total": total,
                "v_min": v_min,
                "v_max": v_max,
                "last_time": last_time,
                "last_v": last_v,
            }
        ]
    )


def running_stats_per_key(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    time_col: str = TIME_COLUMN,
) -> DataFrame:
    """Per-key running count/sum/min/max/latest over a streaming
    DataFrame, maintained across micro-batches in the state store.

    Emits one updated row per key per micro-batch (outputMode=update
    downstream). Batch-equivalent semantics: a plain groupBy agg —
    which is exactly what the oracle-checkable batch query computes;
    this operator is its incremental form.
    """
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(time_col).cast("long").alias("_t"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
