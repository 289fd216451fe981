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
    ArrayType,
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


# ── streaming EWMA ───────────────────────────────────────────────────

_EWMA_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("last_time", LongType()),
    ]
)

_EWMA_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("last_time", LongType()),
    ]
)


def _ewma_update(alpha: float):
    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, acc, last_time = 0, None, -1
        if state.exists:
            n, acc, last_time = state.get
        for pdf in pdfs:
            if not len(pdf):
                continue
            # fold in (time, then input order) — the SAME order the
            # batch q_ewma fold uses, so stream-through == one batch
            pdf = pdf.sort_values(["_t", "_i"], kind="stable")
            for t, x in zip(pdf["_t"].astype("int64"), pdf["_v"].astype("float64")):
                acc = float(x) if acc is None else acc * (1.0 - alpha) + float(x) * alpha
                last_time = int(t)
                n += 1
        state.update((n, acc, last_time))
        yield pd.DataFrame(
            [{"key": key[0], "n": n, "ewma": acc, "last_time": last_time}]
        )

    return update


def ewma_per_key(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    time_col: str = TIME_COLUMN,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-key streaming EWMA (acc = (1-a)*acc + a*x), the incremental
    form of the batch q_ewma fold: state is THREE scalars per key —
    the recurrence never re-reads history, which is exactly why EWMA
    is the streaming-native smoother where a windowed mean is not.

    Caveat (documented, inherent to the recurrence): EWMA is
    order-sensitive, so stream == batch only when rows arrive in
    nondecreasing time order per key; within a micro-batch rows are
    sorted by (time, order_col) to make the fold deterministic, but a
    LATE row landing in a later micro-batch folds late. The batch
    query is the ground truth for a quiesced topic
    (test_streaming.py::test_ewma_stream_matches_batch)."""
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(time_col).cast("long").alias("_t"),
        F.col(order_col).cast("long").alias("_i"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _ewma_update(alpha),
        outputStructType=_EWMA_OUT,
        stateStructType=_EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ── streaming sessionization ─────────────────────────────────────────

_SESS_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("session_seq", LongType()),
        StructField("start_ns", LongType()),
        StructField("end_ns", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

_SESS_STATE = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("start_ns", LongType()),
        StructField("last_ns", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def sessionize_per_key(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    gap_ns: int,
    time_col: str = TIME_COLUMN,
) -> DataFrame:
    """Streaming sessionization: the incremental form of the batch
    q_sessionize_stats query (queries/timeseries.py). Per key, events
    separated by more than ``gap_ns`` start a new session; a session
    is EMITTED when a later event closes it (append mode — closed
    sessions are final and never retracted), while the currently-open
    session lives in the state store across micro-batches.

    Contract mirrors the batch identity: on a quiesced topic, the
    emitted closed sessions equal the batch query's sessions minus
    each key's final (still-open) one — pinned by
    tests/test_streaming.py. Same ordering caveat as ewma_per_key:
    rows are folded in time order WITHIN each micro-batch and batches
    are folded in arrival order; an event older than the state's
    last_ns (cross-batch late data) extends the open session rather
    than rewriting a closed one, because closed emissions are final
    (the at-scale alternative — watermark + retraction — is Spark's
    built-in session_window, streaming/__init__.py, when retraction
    semantics are wanted).

    Scale shape: state is 5 scalars per key in the state store; each
    micro-batch shuffles only its own rows by key.
    """
    import pyspark.sql.functions as F

    update = make_session_updater(gap_ns)
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(time_col).cast("long").alias("_t"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_SESS_OUT,
        stateStructType=_SESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_session_updater(gap_ns: int):
    """The sessionize fold as a standalone updater factory, so the
    machinery (batch concat, stable time sort, close/extend
    transitions, state tuple layout) is directly testable against a
    sequential reference with a fake GroupState
    (tests/test_properties.py) — the same expose-the-fold pattern as
    winnow_fingerprints_fast."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            seq, start, last, n, vsum = state.get
        else:
            seq, start, last, n, vsum = 0, None, None, 0, 0.0
        parts = [p for p in pdfs if len(p)]
        closed: list[tuple] = []
        if parts:
            rows = pd.concat(parts, ignore_index=True).sort_values(
                "_t", kind="stable", ignore_index=True
            )
            for t, v in zip(
                rows["_t"].astype("int64"), rows["_v"].astype("float64")
            ):
                t = int(t)
                if start is None:
                    seq, start, last, n, vsum = seq + 1, t, t, 1, float(v)
                elif t - last > gap_ns:
                    closed.append((key[0], seq, start, last, n, vsum))
                    seq, start, last, n, vsum = seq + 1, t, t, 1, float(v)
                else:
                    last = max(last, t)
                    n += 1
                    vsum += float(v)
        state.update((seq, start, last, n, vsum))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "key",
                    "session_seq",
                    "start_ns",
                    "end_ns",
                    "n_events",
                    "value_sum",
                ],
            )

    return update


# ── streaming heavy hitters (Misra-Gries) ────────────────────────────

_HH_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("approx_count", LongType()),
    ]
)

_HH_STATE = StructType(
    [
        StructField("values", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)


def heavy_hitters_per_key(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    counters: int = 256,
) -> DataFrame:
    """Streaming per-key heavy hitters: the incremental form of
    operators.sketch.heavy_hitters (same Misra-Gries summary, same
    guarantees) with the summary carried across micro-batches in the
    state store instead of merged across partitions.

    Per (key) the state is ≤ ``counters`` (value, count) pairs plus
    the rows-seen total; each micro-batch folds its rows' exact batch
    counts into the summary (the batched MG decrement). Emitted rows
    (update mode) are the CURRENT summary after the batch — counts are
    lower bounds that undercount by at most n_seen/(counters+1), and
    are EXACT while the key's distinct-value count stays ≤ counters
    (the stream==batch identity pinned in tests runs in that regime;
    the eviction-regime bound is pinned against a sequential
    reference in the same test module).

    Scale shape: state is O(counters) per key; each micro-batch
    shuffles only its own rows by key — trending-items dashboards at
    topic scale without a second storage system.
    """
    import pyspark.sql.functions as F

    from ella_spark.operators.sketch import _mg_update

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("_v"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            values, counts, n_seen = state.get
            summary = dict(zip(list(values), [int(c) for c in counts]))
        else:
            summary, n_seen = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_seen += int(pdf["_v"].notna().sum())
            _mg_update(summary, pdf["_v"].value_counts(dropna=True).to_dict(), counters)
        state.update((list(summary.keys()), [int(c) for c in summary.values()], n_seen))
        if summary:
            items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(items),
                    "value": [v for v, _ in items],
                    "approx_count": [c for _, c in items],
                }
            )

    return keyed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_HH_OUT,
        stateStructType=_HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
