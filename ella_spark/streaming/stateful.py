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
    BooleanType,
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


# ── streaming rolling z-score ────────────────────────────────────────

_RZ_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

_RZ_STATE = StructType(
    [
        StructField("ts", ArrayType(LongType())),
        StructField("vc", ArrayType(LongType())),
    ]
)


def rolling_zscore_per_key(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    time_col: str = TIME_COLUMN,
    window_ns: int = 3600 * 1_000_000_000,
    min_n: int = 3,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key trailing-window z-score — the incremental form
    of the batch q_rolling_zscore query (queries/timeseries.py), with
    the SAME exact-arithmetic contract: values carried as int64
    centi-units (count / sum / sum-of-squares are exact integers), the
    final mean/std/z a fixed sequence of correctly-rounded double ops.

    State per key is the (ts, centi-value) pairs inside the trailing
    ``window_ns`` of the newest event seen — O(window density), the
    same bound the batch RANGE frame holds per row. Each new row's
    window [ts - W, ts] is answered from a prefix-sum + binary search
    over the retained events, so a micro-batch costs
    O((state+batch) log(state+batch)) per key.

    Assumes per-key arrival in event-time order ACROSS micro-batches
    (what topic subscribe delivers: shards are time-sorted and the
    unified scan replays them in order). A row arriving in a LATER
    micro-batch, late by more than ``window_ns``, would have its
    window under-counted — the standard streaming caveat; the batch
    query is the replayable ground truth. WITHIN a micro-batch no
    ordering is assumed: all pandas chunks of the group are buffered
    and sorted once before computing, so a key whose batch rows span
    multiple source partitions (and hence arrive across chunks out of
    event-time order) is still scored exactly (r9 ADVICE fix — the
    per-chunk compute-and-evict could drop or under-count
    earlier-timestamped rows in later chunks).

    Arithmetic bound (same contract as the batch query): the int64
    products n*sq and s*s are exact while the trailing window's
    sum(vc²) stays below 2^63/n — with |value| <= 600 (vc <= 6e4,
    vc² <= 3.6e9) that allows ~50M events per key-hour before
    wrap, an absurd density; outside that envelope cast to double
    first (see q_neyman_allocation, whose strata are unbounded).

    Emits (append mode) one row per qualifying event: ``n >= min_n``
    in-window events with positive variance — identical gates to the
    batch query.

    ``idle_timeout_ms`` opts into per-key state GC: a key that
    receives no rows for that long has its retained window DROPPED
    from the state store (ProcessingTimeTimeout). Correctness-neutral
    whenever the timeout exceeds ``window_ns`` in wall time — a window
    that stale could never contribute to a future row — and the
    100 TB hygiene that stops a high-churn key space (user ids,
    session ids) from growing state without bound. Caveat: with a
    timeout configured the micro-batch engine never goes idle (sweeps
    are pending work), so ``query.processAllAvailable()`` blocks
    forever — drive such queries with a real trigger and poll
    progress (see test_rolling_zscore_idle_state_gc).
    """
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle key: the retained window is older than the timeout
            # (> window_ns by contract) — nothing it holds can affect
            # a future row; drop the state entirely.
            state.remove()
            return
        if state.exists:
            st_ts, st_vc = state.get
            old_ts = np.asarray(list(st_ts), dtype=np.int64)
            old_vc = np.asarray(list(st_vc), dtype=np.int64)
        else:
            old_ts = np.array([], dtype=np.int64)
            old_vc = np.array([], dtype=np.int64)

        # buffer ALL chunks of the group's micro-batch, sort ONCE:
        # chunk boundaries follow source partitions, not event time,
        # so per-chunk compute-and-evict would mis-window rows that
        # arrive across chunks out of order (r9 ADVICE). Per-key state
        # stays O(window density); the batch rows were already
        # materialized per group by the state-store exchange.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values("_t", kind="stable")
            b_ts = batch["_t"].to_numpy(dtype=np.int64)
            b_v = batch["_v"].to_numpy(dtype=np.float64)
            # identical rounding to the batch query's centi-unit cast
            b_vc = np.floor(b_v * 100 + 0.5).astype(np.int64)

            all_ts = np.concatenate([old_ts, b_ts])
            all_vc = np.concatenate([old_vc, b_vc])
            order = np.argsort(all_ts, kind="stable")
            all_ts, all_vc = all_ts[order], all_vc[order]
            cs = np.cumsum(all_vc)
            cq = np.cumsum(all_vc * all_vc)

            # per new row: events with ts in [row_ts - W, row_ts]
            lo = np.searchsorted(all_ts, b_ts - window_ns, side="left")
            hi = np.searchsorted(all_ts, b_ts, side="right")
            n = (hi - lo).astype(np.int64)
            s = cs[hi - 1] - np.where(lo > 0, cs[lo - 1], 0)
            sq = cq[hi - 1] - np.where(lo > 0, cq[lo - 1], 0)

            ok = (n >= min_n) & (n * sq > s * s)
            if ok.any():
                nn, ss, qq = n[ok], s[ok], sq[ok]
                mean = ss.astype(np.float64) / (100.0 * nn)
                var = (nn * qq - ss * ss).astype(np.float64) / (
                    10000.0 * nn * (nn - 1)
                )
                outs.append(
                    pd.DataFrame(
                        {
                            "key": key[0],
                            "ts": b_ts[ok],
                            "value": b_v[ok],
                            "z": (b_v[ok] - mean) / np.sqrt(var),
                        }
                    )
                )

            # evict events that can never enter a future row's window
            # (cross-batch ordered arrival ⇒ future ts >= max ts seen)
            horizon = int(all_ts[-1]) - window_ns
            keep = all_ts >= horizon
            old_ts, old_vc = all_ts[keep], all_vc[keep]

        state.update(([int(t) for t in old_ts], [int(c) for c in old_vc]))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_RZ_OUT,
        stateStructType=_RZ_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ── streaming winsorize (KLL-state admission clip) ───────────────────

_WZ_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("id", LongType()),
        StructField("value", DoubleType()),
        StructField("v_clipped", DoubleType()),
        StructField("lo_bound", DoubleType()),
        StructField("hi_bound", DoubleType()),
    ]
)

_WZ_STATE = StructType(
    [
        StructField("levels", ArrayType(ArrayType(DoubleType()))),
        StructField("parity", LongType()),
    ]
)


def _kll_rank_value(levels: list, target_rank: int) -> float:
    """Smallest value whose cumulative weight reaches ``target_rank``
    (1-based) — the order-statistic query both winsorize cut points
    reduce to (kll_quantiles expressed for an explicit rank)."""
    import numpy as np

    vals = np.concatenate([np.asarray(l, dtype=np.float64) for l in levels])
    wts = np.concatenate(
        [np.full(len(l), 1 << i, dtype=np.int64) for i, l in enumerate(levels)]
    )
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    idx = int(np.searchsorted(cum, max(1, target_rank), side="left"))
    return float(vals[min(idx, len(vals) - 1)])


def winsorize_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    lo: float = 0.05,
    k: int = 256,
) -> DataFrame:
    """Streaming winsorize — the incremental admission-gate form of the
    batch q_winsorize query (queries/curation.py): per group, clip each
    arriving value at the lo/1-lo order statistics of ALL values seen
    so far, carrying a mergeable KLL sketch (operators/sketch.py) in
    the state store instead of re-scanning history.

    Cut-point contract matches the batch query exactly: with n values
    seen and ``c = ceil(n·lo)``, the low cut is the c-th smallest and
    the high cut the (n−c+1)-th smallest. While a group's values fit
    level 0 (n ≤ k) the sketch IS the sorted data and the bounds are
    EXACT — the stream==batch identity regime pinned in tests; beyond
    that the bounds carry KLL's O(n/k) rank-error guarantee.

    Bounds fold the current batch in BEFORE clipping, so a stream that
    delivers the corpus in one batch reproduces the batch query
    verbatim. Emits (append) only rows that were clipped, with the
    bounds used.

    Scale shape: state is O(k·log(n/k)) doubles per group; each
    micro-batch shuffles only its own rows by group — the per-group
    clip a 100 TB ingest gate needs without a second pass.
    """
    import math

    import pyspark.sql.functions as F

    from ella_spark.operators.sketch import _kll_compact

    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(value_col).cast("double").alias("_v"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            st_levels, parity = state.get
            levels = [np.asarray(list(l), dtype=np.float64) for l in st_levels]
            parity = int(parity)
        else:
            levels, parity = [], 0

        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            vals = pdf["_v"].to_numpy(dtype=np.float64)
            # fold the batch in first (batch-query parity: bounds are
            # computed over everything seen INCLUDING this batch).
            # Carry the derandomized parity counter across batches so
            # the sketch stays a pure function of the arrival sequence.
            pstate = {"c": parity}
            batch_lvl = [np.sort(vals[~np.isnan(vals)])]
            depth = max(len(levels), 1)
            merged = []
            for i in range(depth):
                xs = levels[i] if i < len(levels) else np.array([])
                ys = batch_lvl[i] if i < len(batch_lvl) else np.array([])
                merged.append(np.sort(np.concatenate([
                    np.asarray(xs, dtype=np.float64),
                    np.asarray(ys, dtype=np.float64),
                ])))
            levels = _kll_compact(merged, k, pstate)
            parity = pstate["c"]

            n = sum(len(l) * (1 << i) for i, l in enumerate(levels))
            c = math.ceil(n * lo)
            if c < 1:
                continue
            lo_b = _kll_rank_value(levels, c)
            hi_b = _kll_rank_value(levels, n - c + 1)
            clipped = (vals < lo_b) | (vals > hi_b)
            if clipped.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "group": key[0],
                            "id": pdf["_id"].to_numpy(dtype=np.int64)[clipped],
                            "value": vals[clipped],
                            "v_clipped": np.clip(vals[clipped], lo_b, hi_b),
                            "lo_bound": lo_b,
                            "hi_bound": hi_b,
                        }
                    )
                )

        state.update(
            ([[float(v) for v in l] for l in levels], parity)
        )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=_WZ_OUT,
        stateStructType=_WZ_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ── streaming PSI drift monitor ──────────────────────────────────────

_PSI_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_ref", LongType()),
        StructField("n_buckets", LongType()),
        StructField("psi", DoubleType()),
    ]
)

_PSI_STATE = StructType(
    [
        StructField("counts", ArrayType(LongType())),
    ]
)


def _check_bucket_args(lo_edge: float, hi_edge: float, buckets: int) -> None:
    """Fail fast on degenerate fixed-edge histogram arguments: a
    non-positive width would silently clamp every value into bucket 0
    (inf -> int64 cast) instead of erroring. The SQL TVF layer has the
    _positive_buckets guard; this is its Python-monitor-API twin."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not hi_edge > lo_edge:
        raise ValueError(
            f"hi_edge must be > lo_edge, got [{lo_edge}, {hi_edge})"
        )


def psi_drift_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    lo_edge: float,
    hi_edge: float,
    buckets: int = 10,
) -> DataFrame:
    """Streaming PSI drift monitor — the incremental form of the batch
    q_psi_drift query (queries/relational.py): per group, score each
    arriving micro-batch's value distribution against the reference
    histogram of EVERYTHING seen before it, then fold the batch into
    the reference. The canonical "is today's ingest shaped like the
    corpus?" gate, evaluated continuously.

    Bucket edges are FIXED arguments (``[lo_edge, hi_edge)`` split into
    ``buckets`` equal widths, outliers clamped to the end buckets) —
    at 100 TB the edges come from a one-time profile pass, and fixing
    them is what makes per-group state O(buckets) longs instead of a
    quantile sketch. PSI terms use buckets where BOTH sides have mass
    (same zero-handling contract as the batch query); ``n_buckets``
    reports how many contributed.

    Emits (append) one row per group per micro-batch once a reference
    exists; the first batch of a group seeds the reference silently.
    """
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("double").alias("_v"),
    )
    _check_bucket_args(lo_edge, hi_edge, buckets)
    width = (hi_edge - lo_edge) / buckets

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        ref = (
            np.asarray(list(state.get[0]), dtype=np.int64)
            if state.exists
            else np.zeros(buckets, dtype=np.int64)
        )
        # buffer all chunks: ONE score per group per micro-batch, as
        # the contract above states (chunk boundaries are an Arrow
        # batch-size artifact, not a semantic unit)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            v = pd.concat(chunks, ignore_index=True)["_v"].to_numpy(
                dtype=np.float64
            )
            v = v[~np.isnan(v)]
            idx = np.clip(
                np.floor((v - lo_edge) / width).astype(np.int64), 0, buckets - 1
            )
            cur = np.bincount(idx, minlength=buckets).astype(np.int64)
            n_ref, n_cur = int(ref.sum()), int(cur.sum())
            if n_ref > 0 and n_cur > 0:
                both = (ref > 0) & (cur > 0)
                p = cur[both].astype(np.float64) / n_cur
                q = ref[both].astype(np.float64) / n_ref
                outs.append(
                    pd.DataFrame(
                        [
                            {
                                "group": key[0],
                                "n_batch": n_cur,
                                "n_ref": n_ref,
                                "n_buckets": int(both.sum()),
                                "psi": float(((p - q) * np.log(p / q)).sum()),
                            }
                        ]
                    )
                )
            ref = ref + cur
        state.update(([int(c) for c in ref],))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=_PSI_OUT,
        stateStructType=_PSI_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ── streaming chi-squared drift monitor ──────────────────────────────

_CHI2_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_ref", LongType()),
        StructField("dof", LongType()),
        StructField("n_novel", LongType()),
        StructField("n_missing", LongType()),
        StructField("chi2", DoubleType()),
    ]
)

_CHI2_STATE = StructType(
    [
        StructField("cats", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def chi2_drift_per_group(
    stream: DataFrame,
    group_col: str,
    category_col: str,
) -> DataFrame:
    """Streaming chi-squared categorical-mix drift — the incremental
    form of the batch q_chi2_drift / chi2_by_slice shape
    (operators/drift.py), completing the drift family's streaming
    column (PSI, z-score, winsorize, quantiles had streaming forms;
    chi² didn't): per group, score each arriving micro-batch's
    category counts as a goodness-of-fit chi² against the reference
    mix of EVERYTHING seen before it, then fold the batch into the
    reference — the reference-histogram-accumulate pattern of
    psi_drift_per_group applied to categorical columns.

    chi² = Σ_c (o_c − e_c)²/e_c over ALL reference categories — the
    standard goodness-of-fit form: a reference category ABSENT from
    the batch contributes its full expected mass e_c = n_batch ·
    ref_c/n_ref as (0 − e_c)²/e_c = e_c, so a dominant category
    vanishing is a first-class drift signal, not an artifact inflating
    the surviving terms (r9 ADVICE: the both-sides-only form
    understated chi² and dof when a known category disappeared,
    asymmetric with the novel side). ``dof`` = reference categories −
    1; ``n_missing`` counts reference categories with zero batch
    observations (mirroring ``n_novel``). Categories present in the
    batch but never seen in the reference still have no expected mass
    and no finite term — they are counted in ``n_novel`` instead (a
    novel-category burst is its own drift signal even when chi² over
    the known mix stays flat). Terms are summed in sorted category
    order: a restart replays to identical doubles.

    State per (group) is the category→count map — O(distinct
    categories) longs, the categorical analog of the PSI monitor's
    O(buckets). All chunks of the micro-batch are buffered and scored
    once (one row per group per micro-batch; chunk boundaries are an
    Arrow artifact). The first batch of a group seeds the reference
    silently. Emits in append mode.
    """
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(category_col).cast("string").alias("_c"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            cats, counts = state.get
            ref = dict(zip(list(cats), [int(c) for c in counts]))
        else:
            ref = {}

        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            c = pd.concat(chunks, ignore_index=True)["_c"].dropna()
            cur = {str(k): int(v) for k, v in c.value_counts().items()}
            n_ref = sum(ref.values())
            n_cur = sum(cur.values())
            if n_ref > 0 and n_cur > 0:
                novel = sum(1 for k in cur if ref.get(k, 0) <= 0)
                missing = sum(1 for k in ref if cur.get(k, 0) <= 0)
                chi2 = 0.0
                for k in sorted(ref):
                    e = n_cur * (ref[k] / n_ref)
                    o = float(cur.get(k, 0))
                    chi2 += (o - e) * (o - e) / e
                outs.append(
                    pd.DataFrame(
                        [
                            {
                                "group": key[0],
                                "n_batch": n_cur,
                                "n_ref": n_ref,
                                "dof": max(len(ref) - 1, 0),
                                "n_novel": novel,
                                "n_missing": missing,
                                "chi2": chi2,
                            }
                        ]
                    )
                )
            for k, v in cur.items():
                ref[k] = ref.get(k, 0) + v

        items = sorted(ref.items())
        state.update(([k for k, _ in items], [v for _, v in items]))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=_CHI2_OUT,
        stateStructType=_CHI2_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ── streaming KS drift monitor ───────────────────────────────────────

def _value_counts_monitor(stream, group_col, value_col, out_schema, score):
    """Shared scaffolding of the KS / EMD / AUC monitors (r10
    self-review: the state decode, NaN filter, unique-counts
    reduction and sorted-merge fold existed in three verbatim
    copies): per-group sorted (value, count) reference state; each
    micro-batch is buffered, reduced to unique (values, counts),
    scored against the reference by ``score(cur_v, cur_c, ref_v,
    ref_c, n_cur, n_ref) -> {statistic columns}``, then folded in.
    Emits (group, n_batch, n_ref, *score columns) in append mode;
    the first batch of a group seeds the reference silently. State is
    O(distinct values) — bounded by the VALUE DOMAIN; quantize
    upstream at unbounded cardinality (the PSI/JS monitors are the
    fixed-memory alternative)."""
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("double").alias("_v"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            st_v, st_c = state.get
            ref_v = np.asarray(list(st_v), dtype=np.float64)
            ref_c = np.asarray(list(st_c), dtype=np.int64)
        else:
            ref_v = np.array([], dtype=np.float64)
            ref_c = np.array([], dtype=np.int64)

        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            v = pd.concat(chunks, ignore_index=True)["_v"].to_numpy(
                dtype=np.float64
            )
            v = v[~np.isnan(v)]
            cur_v, cur_c = np.unique(v, return_counts=True)
            n_ref, n_cur = int(ref_c.sum()), int(cur_c.sum())
            if n_ref > 0 and n_cur > 0:
                outs.append(
                    pd.DataFrame(
                        [
                            {
                                "group": key[0],
                                "n_batch": n_cur,
                                "n_ref": n_ref,
                                **score(
                                    cur_v, cur_c, ref_v, ref_c, n_cur, n_ref
                                ),
                            }
                        ]
                    )
                )
            # fold the batch into the reference (sorted merge)
            all_v = np.concatenate([ref_v, cur_v])
            all_c = np.concatenate([ref_c, cur_c])
            order = np.argsort(all_v, kind="stable")
            all_v, all_c = all_v[order], all_c[order]
            uniq, start = np.unique(all_v, return_index=True)
            summed = np.add.reduceat(all_c, start)
            ref_v, ref_c = uniq, summed

        state.update(
            ([float(x) for x in ref_v], [int(c) for c in ref_c])
        )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_KSD_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_KSD_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_ref", LongType()),
        StructField("d_stat", DoubleType()),
    ]
)

_KSD_STATE = StructType(
    [
        StructField("vals", ArrayType(DoubleType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def ks_drift_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming two-sample Kolmogorov–Smirnov drift — the incremental
    form of the batch q_ks_drift / ks_by_slice shape, completing the
    drift family's streaming column for the continuous-ECDF statistic
    (PSI binned, chi² categorical, KS continuous): per group, score
    each arriving micro-batch's empirical CDF against the reference
    ECDF of EVERYTHING seen before it, then fold the batch in — the
    reference-accumulate contract of psi/chi2_drift_per_group.

    D = sup_x |F_batch(x) − F_ref(x)|, evaluated at the union of both
    samples' distinct points (both ECDFs are right-continuous step
    functions constant in between — the same reduction the batch
    query documents). State/fold/seeding contracts live in
    _value_counts_monitor (shared with the EMD and AUC monitors).
    """

    def score(cur_v, cur_c, ref_v, ref_c, n_cur, n_ref):
        import numpy as np

        grid = np.union1d(ref_v, cur_v)
        f_ref = np.cumsum(ref_c)[
            np.searchsorted(ref_v, grid, side="right") - 1
        ].astype(np.float64) / n_ref
        f_ref[np.searchsorted(ref_v, grid, side="right") == 0] = 0.0
        f_cur = np.cumsum(cur_c)[
            np.searchsorted(cur_v, grid, side="right") - 1
        ].astype(np.float64) / n_cur
        f_cur[np.searchsorted(cur_v, grid, side="right") == 0] = 0.0
        return {"d_stat": float(np.max(np.abs(f_cur - f_ref)))}

    return _value_counts_monitor(stream, group_col, value_col, _KSD_OUT, score)


_PH_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n", LongType()),
        StructField("ph_up", DoubleType()),
        StructField("ph_down", DoubleType()),
        StructField("alarm_up", BooleanType()),
        StructField("alarm_down", BooleanType()),
    ]
)

_PH_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("m_up", DoubleType()),
        StructField("up_min", DoubleType()),
        StructField("m_dn", DoubleType()),
        StructField("dn_max", DoubleType()),
    ]
)


def page_hinkley_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    time_col: str = TIME_COLUMN,
    delta: float = 0.0,
    lam: float = 50.0,
) -> DataFrame:
    """Streaming Page-Hinkley changepoint detector — the ONLINE
    counterpart of the batch q_changepoint_cusum query (that one
    localizes a shift in replayable history; this one raises the
    alarm as rows arrive, with O(1) scalars of state per key — the
    sequential-detection classic, Page 1954 / Hinkley 1971).

    Per key, for each value x in event-time order (TWO accumulators —
    the classic two-sided form; a single shared accumulator with
    delta > 0 drifts downward on a driftless stream and guarantees an
    eventual false alarm_down):

        n += 1;  total += x;  mean = total / n
        m_up += x − mean − delta;  ph_up   = m_up − min(m_up seen)
        m_dn += x − mean + delta;  ph_down = max(m_dn seen) − m_dn

    ``delta`` is the magnitude tolerance (drifts smaller than delta
    per observation don't accumulate; at delta = 0 both accumulators
    coincide and equal the batch q_page_hinkley recurrence); an alarm
    fires when the respective excursion exceeds ``lam``. Emits one
    row per key per micro-batch with the post-batch statistics
    (append mode) — the caller watches for alarm transitions.

    State is SIX scalars per key — the fixed-memory end of the drift
    family (the KS/PSI monitors keep O(domain)/O(buckets) state and
    score distribution shape; Page-Hinkley keeps O(1) and reacts to
    mean shifts). All chunks of the micro-batch are buffered and
    sorted once by (event time, value) — the value tiebreak makes the
    fold a pure function of the stream's (t, x) MULTISET even when
    equal-time rows arrive from different source partitions (equal
    (t, x) pairs commute through the recurrence) — so a restart or a
    batch replay of the same rows produces bit-identical doubles (the
    rolling_zscore determinism contract).
    """
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            n, total, m_up, up_min, m_dn, dn_max = state.get
            n, total = int(n), float(total)
            m_up, up_min = float(m_up), float(up_min)
            m_dn, dn_max = float(m_dn), float(dn_max)
        else:
            n, total = 0, 0.0
            m_up, up_min, m_dn, dn_max = 0.0, 0.0, 0.0, 0.0

        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values(["_t", "_v"], kind="stable")
            v = batch["_v"].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            for x in v:
                n += 1
                total += float(x)
                dev = float(x) - total / n
                m_up += dev - delta
                up_min = min(up_min, m_up)
                m_dn += dev + delta
                dn_max = max(dn_max, m_dn)
            ph_up = m_up - up_min
            ph_down = dn_max - m_dn
            outs.append(
                pd.DataFrame(
                    [
                        {
                            "group": key[0],
                            "n": n,
                            "ph_up": ph_up,
                            "ph_down": ph_down,
                            "alarm_up": ph_up > lam,
                            "alarm_down": ph_down > lam,
                        }
                    ]
                )
            )

        state.update((n, total, m_up, up_min, m_dn, dn_max))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=_PH_OUT,
        stateStructType=_PH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ── streaming quantiles (KLL state) ──────────────────────────────────

_QT_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n", LongType()),
        StructField("quantiles", ArrayType(DoubleType())),
    ]
)


def quantiles_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple = (0.5, 0.95, 0.99),
    k: int = 256,
) -> DataFrame:
    """Streaming per-group quantiles — the incremental form of the
    batch quantile_rollup (operators/sketch.py): a mergeable KLL
    sketch per group in the state store, each micro-batch folded in,
    the CURRENT quantile estimates emitted per batch (update mode).
    The latency-dashboard primitive (p50/p95/p99 per service) without
    re-scanning history.

    Same exactness contract as every KLL surface here: while a
    group's values fit level 0 (n <= k) the sketch IS the sorted data
    and the estimates are exactly ``quantile_disc``; beyond that the
    O(n/k) rank-error bound applies (pinned in tests/test_sketch.py).
    State is O(k log(n/k)) doubles per group; reuses the identical
    derandomized fold as winsorize_per_group, so a restart replays to
    the same bytes.
    """
    import pyspark.sql.functions as F

    from ella_spark.operators.sketch import _kll_compact, kll_quantiles

    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("double").alias("_v"),
    )
    probs = list(probs)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            st_levels, parity = state.get
            levels = [np.asarray(list(l), dtype=np.float64) for l in st_levels]
            parity = int(parity)
        else:
            levels, parity = [], 0

        saw = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw = True
            vals = pdf["_v"].to_numpy(dtype=np.float64)
            pstate = {"c": parity}
            batch_lvl = [np.sort(vals[~np.isnan(vals)])]
            depth = max(len(levels), 1)
            merged = []
            for i in range(depth):
                xs = levels[i] if i < len(levels) else np.array([])
                ys = batch_lvl[i] if i < len(batch_lvl) else np.array([])
                merged.append(np.sort(np.concatenate([
                    np.asarray(xs, dtype=np.float64),
                    np.asarray(ys, dtype=np.float64),
                ])))
            levels = _kll_compact(merged, k, pstate)
            parity = pstate["c"]

        state.update(([[float(v) for v in l] for l in levels], parity))
        if saw and levels:
            n = sum(len(l) * (1 << i) for i, l in enumerate(levels))
            yield pd.DataFrame(
                [
                    {
                        "group": key[0],
                        "n": n,
                        "quantiles": kll_quantiles(levels, probs),
                    }
                ]
            )

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=_QT_OUT,
        stateStructType=_WZ_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ── streaming Jensen–Shannon drift monitor ───────────────────────────

_JSD_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_ref", LongType()),
        StructField("js", DoubleType()),
    ]
)


def js_drift_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    lo_edge: float,
    hi_edge: float,
    buckets: int = 10,
) -> DataFrame:
    """Streaming Jensen–Shannon drift — the incremental form of the
    batch q_js_divergence query, completing the streaming column for
    the BOUNDED member of the divergence family (PSI blows up when a
    reference bucket empties; JS ∈ [0, ln 2] is defined for any
    histogram pair, so one alert threshold works across groups and
    regimes): per group, score each micro-batch's histogram against
    the reference histogram of EVERYTHING seen before it, then fold
    the batch in — the reference-accumulate contract shared by the
    PSI/chi²/KS monitors, with the identical fixed-edge O(buckets)
    state as psi_drift_per_group (edges from a one-time profile pass).

    JS = 0.5·KL(p‖m) + 0.5·KL(q‖m), m = (p+q)/2; zero-mass buckets on
    one side contribute only the other side's term (0·ln 0 = 0,
    dropped exactly — the batch query's contract). Emits (append) one
    row per group per micro-batch once a reference exists; the first
    batch seeds silently.
    """
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("double").alias("_v"),
    )
    _check_bucket_args(lo_edge, hi_edge, buckets)
    width = (hi_edge - lo_edge) / buckets

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        ref = (
            np.asarray(list(state.get[0]), dtype=np.int64)
            if state.exists
            else np.zeros(buckets, dtype=np.int64)
        )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            v = pd.concat(chunks, ignore_index=True)["_v"].to_numpy(
                dtype=np.float64
            )
            v = v[~np.isnan(v)]
            idx = np.clip(
                np.floor((v - lo_edge) / width).astype(np.int64), 0, buckets - 1
            )
            cur = np.bincount(idx, minlength=buckets).astype(np.int64)
            n_ref, n_cur = int(ref.sum()), int(cur.sum())
            if n_ref > 0 and n_cur > 0:
                p = cur.astype(np.float64) / n_cur
                q = ref.astype(np.float64) / n_ref
                m = 0.5 * (p + q)
                with np.errstate(divide="ignore", invalid="ignore"):
                    t_p = np.where(p > 0, 0.5 * p * np.log(p / m), 0.0)
                    t_q = np.where(q > 0, 0.5 * q * np.log(q / m), 0.0)
                outs.append(
                    pd.DataFrame(
                        [
                            {
                                "group": key[0],
                                "n_batch": n_cur,
                                "n_ref": n_ref,
                                "js": float((t_p + t_q).sum()),
                            }
                        ]
                    )
                )
            ref = ref + cur
        state.update(([int(c) for c in ref],))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=_JSD_OUT,
        stateStructType=_PSI_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ── streaming earth-mover drift monitor ──────────────────────────────

_EMD_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_ref", LongType()),
        StructField("emd", DoubleType()),
    ]
)


def emd_drift_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming 1-D earth-mover (Wasserstein-1) drift — the
    incremental form of the batch q_earth_movers query, completing
    the streaming column for the transport-cost member of the
    distance trio (KS saturates at 1; EMD keeps growing with shift
    MAGNITUDE, in the value column's own units — the score you
    threshold in engineering units, e.g. 'alert when the batch is
    >2.5 units away'): per group, EMD between each micro-batch's
    ECDF and the reference ECDF of everything before it, then fold
    the batch in.

    EMD = Σ_i |F_b(v_i) − F_r(v_i)|·(v_{i+1} − v_i) over the union
    grid (both ECDFs constant between points — the batch query's
    step reduction). State/fold/seeding contracts live in
    _value_counts_monitor (shared with the KS and AUC monitors).
    """

    def score(cur_v, cur_c, ref_v, ref_c, n_cur, n_ref):
        import numpy as np

        grid = np.union1d(ref_v, cur_v)
        f_ref = np.cumsum(ref_c)[
            np.searchsorted(ref_v, grid, side="right") - 1
        ].astype(np.float64) / n_ref
        f_ref[np.searchsorted(ref_v, grid, side="right") == 0] = 0.0
        f_cur = np.cumsum(cur_c)[
            np.searchsorted(cur_v, grid, side="right") - 1
        ].astype(np.float64) / n_cur
        f_cur[np.searchsorted(cur_v, grid, side="right") == 0] = 0.0
        emd = float((np.abs(f_cur - f_ref)[:-1] * np.diff(grid)).sum())
        return {"emd": emd}

    return _value_counts_monitor(stream, group_col, value_col, _EMD_OUT, score)


# ── streaming AUC (Mann–Whitney) drift monitor ───────────────────────

_AUC_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_ref", LongType()),
        StructField("auc", DoubleType()),
    ]
)


def auc_drift_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming Mann–Whitney/ROC-AUC drift — the incremental form of
    the batch q_mann_whitney query, completing the streaming column
    for the RANK member of the drift family (PSI/JS see histogram
    mass, KS the worst ECDF gap, EMD transport cost; AUC is the
    probability a random batch value exceeds a random reference value
    — 0.5 = no shift, invariant under any monotone transform of the
    values, so one threshold survives unit changes and log-scaling):
    per group, score each micro-batch against the reference of
    EVERYTHING seen before it, then fold the batch in.

    AUC = (Σ wins + 0.5·Σ ties)/(n_b·n_r), where wins counts
    (batch, reference) pairs with batch > reference and ties the
    equal pairs — computed exactly from the sorted reference via two
    searchsorted passes, never materializing pairs. State/fold/
    seeding contracts live in _value_counts_monitor (shared with the
    KS and EMD monitors).
    """

    def score(cur_v, cur_c, ref_v, ref_c, n_cur, n_ref):
        import numpy as np

        cum_ref = np.concatenate([[0], np.cumsum(ref_c)])
        lo = np.searchsorted(ref_v, cur_v, side="left")
        hi = np.searchsorted(ref_v, cur_v, side="right")
        wins = cum_ref[lo]            # ref values strictly below
        ties = cum_ref[hi] - cum_ref[lo]
        u = float((cur_c * (wins + 0.5 * ties)).sum())
        return {"auc": u / (n_cur * n_ref)}

    return _value_counts_monitor(stream, group_col, value_col, _AUC_OUT, score)



# -- streaming cardinality / dup-rate monitor (KMV bottom-k state) ----------

_CARD_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_total", LongType()),
        StructField("est_distinct", DoubleType()),
        StructField("est_new", DoubleType()),
        StructField("dup_rate", DoubleType()),
    ]
)

_CARD_STATE = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("n_total", LongType()),
    ]
)


def _kmv_scalar_estimate(hashes, cnt: int, k: int) -> float:
    """operators/sketch.kmv_estimate, scalar twin: exact below k, else
    the unbiased (k-1)/h_(k) form on the int64->(0,1] unit mapping.
    Module-level (not a factory closure) so the property tests drive
    the EXACT arithmetic the monitors use."""
    from ella_spark.operators.sketch import _KMV_SHIFT, _KMV_TWO64

    if cnt < k:
        return float(cnt)
    return float(k - 1) / ((float(hashes[k - 1]) + _KMV_SHIFT) / _KMV_TWO64)


def _kmv_monitor(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
    idle_timeout_ms: int | None,
    snapshot_on_timeout: bool,
    seed: DataFrame | None,
    out_schema: "StructType",
    score,
    marker_metrics,
    tombstone_timeout_ms: int | None = None,
) -> DataFrame:
    """Shared plumbing of the KMV-state streaming monitors
    (cardinality_drift_per_group / set_churn_per_group): JVM-side
    xxhash64 keyed projection (identical to operators/sketch.
    kmv_sketch, so every monitor is pinnable against the batch
    sketches), sorted bottom-k state fold, idle-GC with
    snapshot-on-timeout + O(1) tombstone, and build-time seed restore
    with saturation validation. ``score(ref, hu, merged, n_batch,
    estimate)`` returns the monitor's metric dict for a data batch
    (``hu`` = the batch's hashes, already sorted-unique);
    ``marker_metrics(hs, estimate)`` the subset populated on a GC
    marker row (everything else is NULL there). The metric-column
    list and the snapshot-extended schema are DERIVED from
    ``out_schema`` (fields after group/n_batch/n_total), so a new
    metric can never miss its marker-row NULL pad."""
    import pyspark.sql.functions as F

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    metric_names = tuple(f.name for f in out_schema.fields[3:])
    out_schema_snap = StructType(
        out_schema.fields
        + [
            StructField("snapshot", ArrayType(LongType())),
            # the sketch size the snapshot was cut at: lets a future
            # run's seed validation detect saturated-at-smaller-k
            # snapshots EXACTLY instead of via the estimate heuristic
            StructField("sketch_k", LongType()),
        ]
    )
    if snapshot_on_timeout and idle_timeout_ms is None:
        raise ValueError(
            "snapshot_on_timeout requires idle_timeout_ms (snapshots "
            "are emitted BY the idle-state GC)"
        )
    if tombstone_timeout_ms is not None and idle_timeout_ms is None:
        raise ValueError(
            "tombstone_timeout_ms requires idle_timeout_ms (tombstones "
            "are created BY the idle-state GC)"
        )
    # restore map: newest persisted snapshot per group, loaded once at
    # build time (tiny — only groups the GC ever dropped) and shipped
    # in the update closure
    seed_map: dict[str, tuple[list[int], int]] = {}
    if seed is not None:
        # the saturation indicator is the marker row's own distinct
        # estimate: est_distinct in a cardinality-monitor sink,
        # est_union in a set-churn sink — accept either
        est_col = next(
            (c for c in ("est_distinct", "est_union") if c in seed.columns),
            None,
        )
        has_k = "sketch_k" in seed.columns
        cols = (
            ["group", "snapshot", "n_total"]
            + ([est_col] if est_col else [])
            + (["sketch_k"] if has_k else [])
        )
        picked: dict[str, tuple] = {}  # newest row per group FIRST…
        for r in seed.select(*cols).collect():
            if r.snapshot is None or r.group is None or r.n_total is None:
                continue  # null-tolerant, like the other guards
            n_tot = int(r.n_total)
            prev = picked.get(r.group)
            if prev is None or n_tot > prev[1]:
                est = getattr(r, est_col, None) if est_col else None
                prior_k = getattr(r, "sketch_k", None) if has_k else None
                picked[r.group] = (list(r.snapshot), n_tot, est, prior_k)
        # …then validate only what will actually be restored: a stale,
        # superseded row (e.g. from before a k upgrade) in a long-
        # lived sink must not hard-fail the build
        for group, (snap, n_tot, est, prior_k) in picked.items():
            n_hs = len(snap)
            # a snapshot taken SATURATED at a smaller prior k would be
            # mis-read by this run's exact-below-k branch (cnt < k →
            # "exact"), collapsing the estimates. Downsizing
            # (n_hs >= k) is always a valid bottom-k re-cut; upsizing
            # is valid only for exact (unsaturated) sketches. When the
            # seed row carries the marker's ``sketch_k`` column the
            # check is EXACT: saturated iff the snapshot filled its
            # prior k. The estimate heuristic (est > n_hs + 0.5) is
            # the fallback for older sinks without the column — it
            # can miss, since the (k-1)/h_(k) estimator may
            # legitimately dip below n_hs on a saturated sketch.
            saturated_smaller_k = (
                n_hs >= int(prior_k) and int(prior_k) < k
                if prior_k is not None and n_hs < k
                else (prior_k is None and n_hs < k
                      and est is not None and est > n_hs + 0.5)
            )
            if saturated_smaller_k:
                detail = (
                    f"sketch_k {int(prior_k)}" if prior_k is not None
                    else f"{est_col} {est:.0f}"
                )
                raise ValueError(
                    f"seed snapshot for group {group!r} was taken "
                    f"saturated at a smaller k ({n_hs} hashes, "
                    f"{detail}) — restoring into k={k} "
                    "would mis-read it as exact; rebuild the seed with "
                    "cardinality_seed_from_history at the current k"
                )
            seed_map[group] = (sorted(int(x) for x in snap)[:k], n_tot)
    # hash JVM-side, identically to operators/sketch.kmv_sketch —
    # the stateful fold below never touches a raw value
    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.xxhash64(F.col(value_col)).alias("_h"),
    )

    def _estimate(hashes, cnt: int) -> float:
        return _kmv_scalar_estimate(hashes, cnt, k)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle group: drop the sketch — but with snapshots on,
            # EMIT it first so the sink persists the history the GC
            # would otherwise erase (restore it later via ``seed``),
            # and keep an O(1) TOMBSTONE (empty hashes + the counter)
            # instead of removing outright: totals survive the GC, so
            # a post-GC resume in the SAME run can never rewind
            # n_total to a stale build-time seed. Metrics not named by
            # marker_metrics are NULL on the marker row — a 0.0 would
            # read as a real signal on a last-value-per-group
            # dashboard.
            if state.exists and (snapshot_on_timeout or seed_map):
                # the tombstone is needed whenever ANY continuity
                # mechanism is active: with a seed but no snapshots, a
                # plain remove() would make the post-GC resume fall
                # into the build-time seed branch and REWIND n_total
                # to the stale seed value
                hs, n_total = state.get
                if not hs and tombstone_timeout_ms is not None:
                    # a TOMBSTONE reached its second, longer timeout:
                    # remove it outright. Its snapshot (and counter)
                    # were already emitted on the first GC's marker
                    # row, so with snapshot_on_timeout + seed the
                    # history survives across runs; within THIS run a
                    # group resuming after tombstone expiry restarts
                    # from the build-time seed (or zero). This is the
                    # cap on tombstone growth — without it, state-
                    # entry count grows with total distinct groups
                    # ever seen.
                    state.remove()
                    return
                hs = sorted(int(x) for x in hs)
                state.update(([], int(n_total)))
                if tombstone_timeout_ms is not None:
                    state.setTimeoutDuration(tombstone_timeout_ms)
                # else: no new timeout — the tombstone persists for
                # the run (O(1) per group, but unbounded in the number
                # of distinct groups ever seen; see the
                # tombstone_timeout_ms docs for the tradeoff)
                if snapshot_on_timeout and hs:
                    base = {
                        "group": key[0],
                        "n_batch": 0,
                        "n_total": int(n_total),
                        "snapshot": hs,
                        "sketch_k": k,
                    }
                    base.update(marker_metrics(hs, _estimate))
                    marker = pd.DataFrame([base])
                    for name in metric_names:
                        if name not in marker.columns:
                            marker[name] = pd.array([None], dtype="Float64")
                    yield marker
            else:
                state.remove()
            return

        if state.exists:
            hs, n_total = state.get
            ref = np.asarray(list(hs), dtype=np.int64)
            n_total = int(n_total)
            if ref.size == 0 and key[0] in seed_map:
                # post-GC tombstone: the build-time seed's hashes are
                # the best remaining history; totals keep whichever is
                # larger so emitted n_total stays monotone per group
                s_hs, s_nt = seed_map[key[0]]
                ref = np.asarray(s_hs, dtype=np.int64)
                n_total = max(n_total, s_nt)
        elif key[0] in seed_map:
            # first batch of a fresh query: resume from the persisted
            # snapshot, not from empty
            hs, n_total = seed_map[key[0]]
            ref = np.asarray(hs, dtype=np.int64)
        else:
            ref = np.array([], dtype=np.int64)
            n_total = 0

        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            h = pd.concat(chunks, ignore_index=True)["_h"].to_numpy(
                dtype=np.int64
            )
            n_batch = int(len(h))
            hu = np.unique(h)  # sorted distinct batch hashes, ONCE —
            # both the merge and the score reuse it (a second
            # sort+unique over the raw batch was the hot-path cost)
            merged = np.union1d(ref, hu)[:k]  # sorted unique, re-cut at k
            n_total += n_batch
            row = {
                "group": key[0],
                "n_batch": n_batch,
                "n_total": n_total,
            }
            row.update(score(ref, hu, merged, n_batch, _estimate))
            if snapshot_on_timeout:
                row["snapshot"] = None  # only timeout rows carry one
                row["sketch_k"] = None
            outs.append(pd.DataFrame([row]))
            ref = merged

        state.update(([int(x) for x in ref], n_total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=out_schema_snap if snapshot_on_timeout else out_schema,
        stateStructType=_CARD_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def cardinality_drift_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 1024,
    idle_timeout_ms: int | None = None,
    snapshot_on_timeout: bool = False,
    seed: DataFrame | None = None,
    tombstone_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming distinct-count / duplicate-rate monitor per group —
    the CARDINALITY member of the drift column (PSI/chi²/KS/JS/EMD/AUC
    watch the value DISTRIBUTION; this watches how many DISTINCT
    values arrive, the dedup-rate signal an ingest pipeline tails:
    a crawler re-fetching yesterday's pages shows up as dup_rate
    jumping toward 1.0 long before any value-distribution monitor
    moves).

    State is the KMV (K-Minimum-Values) bottom-k sketch of
    ``operators/sketch.kmv_sketch`` — and EXACTLY it: values are
    hashed with the same JVM ``xxhash64`` in the keyed projection
    (zero Python hashing), the state is the sorted k smallest hashes,
    and the estimator is the same (k-1)/h_(k) unbiased form, so the
    stream fold is pinned value-identical against the batch operator
    on the concatenated history (test_streaming). While a group has
    seen < k distinct hashes the sketch holds ALL of them and every
    emitted number is EXACT (the exact-when-fits contract shared with
    heavy_hitters / quantile_rollup).

    Emits one row per group per non-empty micro-batch (append mode;
    unlike the distribution monitors there is no reference to seed —
    a single batch has a well-defined cardinality, so the FIRST batch
    already emits, with est_new = est_distinct):

    - ``est_distinct``: distinct values seen over the whole stream;
    - ``est_new``: distinct values this batch introduced;
    - ``dup_rate``: 1 - est_new / n_batch, clipped to [0, 1] — the
      fraction of batch rows that added nothing new.

    State is O(k) longs per group regardless of stream length; k=1024
    gives ~3% relative error past k distinct values (σ ≈ 1/√(k-2)).

    ``idle_timeout_ms`` opts into per-group state GC
    (ProcessingTimeTimeout, the rolling_zscore pattern) for
    high-churn group spaces (session ids, per-crawl batches) whose
    state would otherwise grow without bound. UNLIKE the z-score
    monitor this is NOT correctness-neutral: dropping an idle group
    forgets its distinct history, so if the group resumes, its first
    batch re-seeds (est_new counts previously-seen values as new).
    Use it when groups are ephemeral and a reset baseline is
    acceptable; leave it None to keep lifetime-exact dedup rates.
    Caveat shared with rolling_zscore: with a timeout configured the
    micro-batch engine never idles, so drive the query with a real
    trigger and poll progress instead of processAllAvailable().

    ``snapshot_on_timeout`` (requires ``idle_timeout_ms``) removes the
    history-reset footgun: instead of silently dropping an idle
    group's sketch, the timeout EMITS it — a marker row with
    ``n_batch = 0``, the sorted bottom-k hashes in a ``snapshot``
    column, and ``est_new`` / ``dup_rate`` NULL (a 0.0 would read as
    a real "all-new content" signal on a last-value-per-group
    dashboard; ``snapshot`` is NULL on ordinary score rows, and the
    output schema gains the column only when this is on, so existing
    consumers are untouched). The sink the user already writes thus
    persists every GC'd sketch for free (marker rows also carry a
    ``sketch_k`` column — the k the snapshot was cut at — so a later
    run's seed validation can detect saturated-at-smaller-k snapshots
    exactly), and the GC keeps an O(1)
    tombstone (counter only, no hashes) per evicted group so emitted
    ``n_total`` stays monotone even if the group resumes in the same
    run; full O(k) state is held only for LIVE groups. TRADEOFF: the
    tombstones themselves never expire by default, so while per-group
    state drops to O(1) after GC, the NUMBER of state entries still
    grows with total distinct groups ever seen — the idle GC caps
    per-group size, not group-space growth. For unbounded group
    spaces (session ids, per-crawl batch ids) set
    ``tombstone_timeout_ms``: a second, longer timeout after which a
    tombstone is removed outright. Its counter survives in the first
    GC's marker row (restorable via ``seed`` on the next run), but a
    group resuming IN THE SAME RUN after its tombstone expired
    restarts from the build-time seed (or zero) — with seed-only
    continuity (no snapshots) that group's ``n_total`` can rewind, so
    pick a tombstone timeout comfortably above the longest plausible
    group dormancy.

    ``seed`` is the restore half: a small batch DataFrame with columns
    ``(group, snapshot, n_total)`` — e.g.
    ``SELECT group, snapshot, n_total FROM <sink> WHERE snapshot IS
    NOT NULL`` from a prior run. Its newest snapshot per group
    (largest ``n_total``) is loaded driver-side at build time and
    ships to the executors inside the closure (bounded: O(groups × k)
    longs — snapshots of GC'd idle groups, not the corpus), and a
    group's FIRST batch resumes from its snapshot instead of
    re-seeding, so previously-seen values are no longer counted as
    new after a GC + resume or a full query restart. With a seed
    configured the idle-GC keeps the O(1) counter tombstone even when
    ``snapshot_on_timeout`` is off — a plain removal would send a
    post-GC resume back to the stale build-time seed and rewind
    emitted ``n_total``. Two contracts to
    know: (1) sink snapshots cover only groups the GC actually
    evicted — a group still live (or idle but not yet timed out) when
    a run stops leaves no snapshot row; for FULL coverage build the
    seed from batch history with ``cardinality_seed_from_history``,
    which is value-identical to the stream fold by the kmv_sketch
    pinning. (2) a snapshot taken SATURATED at a smaller prior ``k``
    cannot be restored into a larger ``k`` (the exact-below-k branch
    would mis-read it); when the seed frame carries the marker row's
    ``sketch_k`` column this is detected EXACTLY and raised at build
    time (``est_distinct`` is the heuristic fallback for older sinks
    — it can miss, since the estimator may legitimately dip below the
    hash count on a saturated sketch), otherwise keep ``k``
    consistent across runs. (3) ``n_total`` is a MONITORING counter,
    not a physical row count: it sums the seed's ``n_total`` plus
    every row the new checkpoint processes — including rows the
    source REPLAYS when the query starts from a fresh checkpoint
    (e.g. a topic re-read from offset 0), which the seed already
    counted once. Dashboards wanting physical rows should count the
    source, not this column; the per-batch scores are unaffected
    (re-played values are correctly scored as duplicates)."""

    return _kmv_monitor(
        stream,
        group_col,
        value_col,
        k,
        idle_timeout_ms,
        snapshot_on_timeout,
        seed,
        _CARD_OUT,
        _cardinality_score,
        lambda hs, est: {"est_distinct": est(hs, len(hs))},
        tombstone_timeout_ms,
    )


def _cardinality_score(ref, hu, merged, n_batch, est):
    """Per-batch cardinality metrics (module-level so the pure fold
    arithmetic is property-testable without a stream — see
    test_streaming's hypothesis fold test)."""
    before = est(ref, len(ref))
    after = est(merged, len(merged))
    new = max(after - before, 0.0)
    return {
        "est_distinct": after,
        "est_new": new,
        "dup_rate": min(max(1.0 - new / n_batch, 0.0), 1.0),
    }


_CHURN_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_total", LongType()),
        StructField("est_batch", DoubleType()),
        StructField("est_union", DoubleType()),
        StructField("jaccard", DoubleType()),
        StructField("containment", DoubleType()),
        StructField("novelty", DoubleType()),
    ]
)

def set_churn_per_group(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 1024,
    idle_timeout_ms: int | None = None,
    snapshot_on_timeout: bool = False,
    seed: DataFrame | None = None,
    tombstone_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming SET-CHURN monitor per group — the content-rotation
    signal: how much of each micro-batch's distinct-value SET overlaps
    the accumulated history. Where cardinality_drift_per_group counts
    how many distinct values arrive, this scores WHICH ones: a source
    that suddenly ships a disjoint url/domain/shingle set (upstream
    content rotation, a crawler pointed at the wrong seed list, a
    feed swap) alarms here with novelty → 1.0 even when its distinct
    COUNT per batch is unchanged.

    Method is EXACTLY operators/sketch.kmv_overlap's Beyer et al.
    (SIGMOD'07) merged-re-cut estimate with A = accumulated history,
    B = the batch: merge the two bottom-k sketches, re-cut at k — the
    merged bottom-k is a uniform sample of A ∪ B, so
    shared/|merged| estimates Jaccard, jaccard × union_est the
    intersection, and inter_est / est_batch the CONTAINMENT of the
    batch in history (novelty = 1 - containment). Same JVM xxhash64
    keyed projection and (k-1)/h_(k) estimator as the batch operator,
    so the stream score is pinnable value-identical against
    kmv_overlap on (history, batch) framed as two groups
    (test_streaming). Exact whenever the union still fits in k.

    Emits one row per group per non-empty micro-batch (append mode;
    the FIRST batch scores against empty history: jaccard 0,
    containment 0, novelty 1):

    - ``est_batch``: distinct values in this batch (exact below k);
    - ``est_union``: distinct values ever seen incl. this batch;
    - ``jaccard``: batch-set vs history-set similarity;
    - ``containment``: fraction of the batch's distinct values
      already in history (1.0 = pure re-crawl);
    - ``novelty``: 1 - containment (1.0 = fully rotated content).

    State, GC, ``snapshot_on_timeout``, ``seed``, and
    ``tombstone_timeout_ms`` are shared with
    cardinality_drift_per_group (same O(k) bottom-k state, same O(1)
    tombstone + marker-row contract — churn metrics are NULL on
    marker rows, markers carry ``sketch_k`` for exact seed validation
    — and cardinality_seed_from_history builds a valid seed for this
    monitor too, the state layout is identical; see that function's
    docs for the tombstone-growth tradeoff and the ``n_total``
    replay-counting contract).
    """

    return _kmv_monitor(
        stream,
        group_col,
        value_col,
        k,
        idle_timeout_ms,
        snapshot_on_timeout,
        seed,
        _CHURN_OUT,
        _churn_score(k),
        lambda hs, est: {"est_union": est(hs, len(hs))},
        tombstone_timeout_ms,
    )


def _churn_score(k: int):
    """Per-batch set-churn metrics for a given sketch size (module-
    level factory so the Beyer merged-re-cut arithmetic is
    property-testable without a stream)."""

    def score(ref, hu, merged, n_batch, est):
        import numpy as np

        bk = hu[:k]  # the batch's OWN bottom-k sketch (hu pre-sorted)
        m = len(merged)
        union_est = est(merged, m)
        shared = int(
            np.count_nonzero(np.isin(merged, ref) & np.isin(merged, bk))
        )
        jaccard = shared / m if m else 0.0
        est_batch = est(bk, len(bk))
        inter_est = jaccard * union_est
        containment = (
            min(inter_est / est_batch, 1.0) if est_batch > 0 else 0.0
        )
        return {
            "est_batch": est_batch,
            "est_union": union_est,
            "jaccard": jaccard,
            "containment": containment,
            "novelty": max(1.0 - containment, 0.0),
        }

    return score


def cardinality_seed_from_history(
    df: DataFrame, group_col: str, value_col: str, k: int = 1024
) -> DataFrame:
    """Full-coverage ``seed`` frame for ``cardinality_drift_per_group``
    built from BATCH history — the restore path that covers EVERY
    group, not just the ones the idle-GC happened to snapshot before
    a run stopped (a group still live at shutdown leaves no snapshot
    row in the sink).

    Because the stream fold is pinned value-identical to
    ``operators/sketch.kmv_sketch`` (same JVM xxhash64, same sorted
    bottom-k), this returns EXACTLY the state the monitor would hold
    after consuming ``df`` as micro-batches: one row per group with
    the sorted bottom-``k`` hashes in ``snapshot`` and the group's
    total row count in ``n_total``. Use the SAME ``k`` as the monitor.

    Plan shape: one distinct + one group-keyed window for the sketch,
    one group-keyed count — two shuffles on the group key, output
    <= k + 1 rows per group regardless of history size.
    """
    import pyspark.sql.functions as F

    from ella_spark.operators.sketch import kmv_sketch

    src = df.select(
        F.col(group_col).cast("string").alias("g"), F.col(value_col).alias("v")
    )
    hashes = kmv_sketch(src, "g", "v", k=k).groupBy("grp").agg(
        F.sort_array(F.collect_list("h")).alias("snapshot")
    )
    totals = src.groupBy(F.col("g").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    return hashes.join(totals, "grp").select(
        F.col("grp").alias("group"),
        "snapshot",
        "n_total",
        # the k this seed was cut at: lets the monitor's build-time
        # validation detect saturated-at-smaller-k seeds EXACTLY
        F.lit(k).cast("long").alias("sketch_k"),
    )


_MHD_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n_batch", LongType()),
        StructField("n_total", LongType()),
        StructField("est_jaccard", DoubleType()),
        StructField("est_containment", DoubleType()),
        StructField("novelty", DoubleType()),
    ]
)


def minhash_drift_per_group(
    stream: DataFrame,
    group_col: str,
    text_col: str,
    shingle_k: int = 8,
    num_hashes: int = 64,
    idle_timeout_ms: int | None = None,
    snapshot_on_timeout: bool = False,
    seed: DataFrame | None = None,
    tombstone_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-SIGNATURE drift monitor per group — the
    SIMILARITY member that completes the monitor column (count →
    cardinality → set → similarity): per group, how textually similar
    is each micro-batch's content to everything the group has shipped
    before? Where set_churn_per_group scores exact value-set overlap
    (a url seen once is "known" forever, a one-character edit is
    "new"), this scores SHINGLE-level similarity — a source that
    starts shipping lightly-reworded variants of its own history
    keeps est_containment high / novelty low here while the set
    monitor calls every variant novel, and a true content rotation
    drives novelty to ~1 on both.

    Method: each row's text maps to its production-path MinHash
    signature JVM→Arrow-side (``operators/dedup.minhash_sig_udf`` —
    the same ``_kgram_hashes``/``_mix64`` chain as the LSH dedup
    fast path), so only (group, 8·num_hashes bytes) cross the
    shuffle, never documents. State per group is the signature of
    the UNION of every shingle set ever seen, maintained by the
    MinHash union law sig(A ∪ B) = slotwise min(sig(A), sig(B)) —
    O(num_hashes) longs per group regardless of stream length. Each
    batch scores the slot-agreement fraction between the batch's
    union signature and the history signature BEFORE merging:
    an unbiased estimate of Jaccard(batch shingles, history
    shingles), ±1/√num_hashes. The fold is pinned value-identical to
    the batch operator (elementwise min over per-doc
    ``shingle_minhash_udf`` signatures) in test_streaming.

    Emits one row per group per micro-batch that contains at least
    one shingleable document (texts shorter than ``shingle_k`` after
    lower/trim are filtered in the keyed projection and do not count
    toward ``n_batch``):

    - ``est_jaccard``: estimated shingle-set Jaccard between this
      batch's content and the accumulated history (first batch: 0.0).
      SCALE CAVEAT: Jaccard is union-normalized, so it shrinks toward
      |batch|/|history| as history accumulates — a pure replay of a
      tiny batch against a month of history legitimately scores ~0
      here. Read it for batch-vs-history SIMILARITY only when the two
      are comparable in size; the drift signal to alarm on is
      ``novelty`` below.
    - ``est_containment``: estimated batch-normalized containment
      |B ∩ H| / |B| (r13 advice) — "what fraction of THIS batch's
      shingles has the group shipped before?", invariant to how large
      the history has grown: a pure replay scores 1.0 whether history
      is 3 docs or 3 million. Derived entirely from slot agreement via
      the identity C = J(B,H) / J(B, B∪H): the numerator is the
      batch↔history agreement above, the denominator the
      batch↔merged-signature agreement (an estimate of |B|/|B∪H|;
      slotwise, batch == history implies batch == merged, so the
      ratio never exceeds 1). Resolution floor: the denominator is
      clamped to 1/num_hashes — when a batch is so much smaller than
      history that NONE of its slots survive the merge (|B|/|B∪H|
      below ~1/num_hashes) there is zero overlap evidence either way
      and the score degrades to 0; raise ``num_hashes`` if batches
      that small must still resolve. First batch: 0.0.
    - ``novelty``: 1 - est_containment (first batch: 1.0) — the same
      batch-normalized semantics as ``set_churn_per_group``'s
      novelty, so the two monitors' alarms agree: a replayed or
      lightly-reworded batch stays near 0 at ANY history size, a true
      rotation jumps to ~1.

    GC/restore plumbing follows the KMV monitors: ``idle_timeout_ms``
    drops idle groups; ``snapshot_on_timeout`` emits the evicted
    signature as a marker row (``n_batch = 0``, scores NULL,
    ``snapshot`` = the signature, ``sig_shingle_k`` = the shingle
    width it was built at) and keeps the O(1) counter tombstone;
    ``tombstone_timeout_ms`` expires tombstones (same group-space
    growth tradeoff as cardinality_drift_per_group — see its docs);
    ``seed`` restores the newest snapshot per group at build time.
    Seed validation is fully EXACT here: a signature's length IS its
    num_hashes (mismatch → ValueError), and a ``sig_shingle_k``
    column (present in any snapshot-derived seed) must match
    ``shingle_k`` — both parameters change the hash space, so a
    mismatched restore would score garbage silently. ``n_total``
    follows the same replay-counting contract as the KMV monitors
    (seed total + every row the new checkpoint processes)."""
    import numpy as np
    import pyspark.sql.functions as F

    from ella_spark.operators.dedup import minhash_sig_udf, normalize_text

    if num_hashes < 2:
        raise ValueError(f"num_hashes must be >= 2, got {num_hashes}")
    if snapshot_on_timeout and idle_timeout_ms is None:
        raise ValueError(
            "snapshot_on_timeout requires idle_timeout_ms (snapshots "
            "are emitted BY the idle-state GC)"
        )
    if tombstone_timeout_ms is not None and idle_timeout_ms is None:
        raise ValueError(
            "tombstone_timeout_ms requires idle_timeout_ms (tombstones "
            "are created BY the idle-state GC)"
        )
    out_schema = (
        StructType(
            _MHD_OUT.fields
            + [
                StructField("snapshot", ArrayType(LongType())),
                StructField("sig_shingle_k", LongType()),
            ]
        )
        if snapshot_on_timeout
        else _MHD_OUT
    )

    seed_map: dict[str, tuple[list[int], int]] = {}
    if seed is not None:
        has_sk = "sig_shingle_k" in seed.columns
        cols = ["group", "snapshot", "n_total"] + (
            ["sig_shingle_k"] if has_sk else []
        )
        picked: dict[str, tuple] = {}
        for r in seed.select(*cols).collect():
            if r.snapshot is None or r.group is None or r.n_total is None:
                continue
            n_tot = int(r.n_total)
            prev = picked.get(r.group)
            if prev is None or n_tot > prev[1]:
                sk = getattr(r, "sig_shingle_k", None) if has_sk else None
                picked[r.group] = (list(r.snapshot), n_tot, sk)
        for group, (snap, n_tot, sk) in picked.items():
            if len(snap) != num_hashes:
                raise ValueError(
                    f"seed signature for group {group!r} has "
                    f"{len(snap)} slots but the monitor runs "
                    f"num_hashes={num_hashes} — signatures from a "
                    "different num_hashes cannot be restored; rebuild "
                    "the history at the current parameters"
                )
            if sk is not None and int(sk) != shingle_k:
                raise ValueError(
                    f"seed signature for group {group!r} was built at "
                    f"shingle_k={int(sk)} but the monitor runs "
                    f"shingle_k={shingle_k} — different shingle widths "
                    "hash different gram spaces; rebuild the history "
                    "at the current parameters"
                )
            seed_map[group] = ([int(x) for x in snap], n_tot)

    sig = minhash_sig_udf(shingle_k, num_hashes)
    keyed = (
        stream.select(
            F.col(group_col).cast("string").alias("group"),
            normalize_text(F.col(text_col)).alias("_t"),
        )
        .where(F.length("_t") >= shingle_k)
        # no isNotNull filter on the signature: length(_t) >= shingle_k
        # guarantees >= 1 k-gram so the UDF never returns NULL here,
        # and filtering on the UDF column made Catalyst evaluate the
        # Arrow UDF TWICE per row (once under the Filter, once for the
        # state-input projection — r14 plan audit); the fold also
        # skips None defensively
        .select("group", sig("_t").alias("_sig"))
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if idle_timeout_ms is not None and state.hasTimedOut:
            if state.exists and (snapshot_on_timeout or seed_map):
                hs, n_total = state.get
                if not hs and tombstone_timeout_ms is not None:
                    state.remove()  # expired tombstone (see KMV docs)
                    return
                hs = [int(x) for x in hs]
                state.update(([], int(n_total)))
                if tombstone_timeout_ms is not None:
                    state.setTimeoutDuration(tombstone_timeout_ms)
                if snapshot_on_timeout and hs:
                    yield pd.DataFrame(
                        [
                            {
                                "group": key[0],
                                "n_batch": 0,
                                "n_total": int(n_total),
                                "est_jaccard": None,
                                "est_containment": None,
                                "novelty": None,
                                "snapshot": hs,
                                "sig_shingle_k": shingle_k,
                            }
                        ]
                    )
            else:
                state.remove()
            return

        if state.exists:
            hs, n_total = state.get
            ref = np.asarray(list(hs), dtype=np.int64)
            n_total = int(n_total)
            if ref.size == 0 and key[0] in seed_map:
                s_hs, s_nt = seed_map[key[0]]
                ref = np.asarray(s_hs, dtype=np.int64)
                n_total = max(n_total, s_nt)
        elif key[0] in seed_map:
            hs, n_total = seed_map[key[0]]
            ref = np.asarray(hs, dtype=np.int64)
        else:
            ref = np.array([], dtype=np.int64)
            n_total = 0
        if ref.size not in (0, num_hashes):
            # unlike the KMV monitors (whose bottom-k re-cut absorbs a
            # k change mid-checkpoint), a signature from a different
            # num_hashes is semantically meaningless to compare — this
            # only happens when the SAME checkpoint is restarted with
            # a changed num_hashes (the seed path validates at build
            # time); fail loudly instead of scoring garbage
            raise ValueError(
                f"group {key[0]!r}: checkpointed signature has "
                f"{ref.size} slots but the monitor runs "
                f"num_hashes={num_hashes} — use a fresh checkpoint "
                "(plus a seed) when changing num_hashes"
            )

        chunks = [pdf for pdf in pdfs if len(pdf)]
        outs = []
        if chunks:
            # fold in UNSIGNED order: _mix64 signatures are uint64
            # mins, merely STORED as int64 bit patterns — a signed
            # np.minimum would let a >= 2^63 slot (negative as int64)
            # beat a smaller unsigned value, which happens with
            # probability 2^-n_shingles per slot per doc (common for
            # short docs) and breaks the union law the fold relies on
            sigs = [
                np.asarray(s, dtype=np.int64).view(np.uint64)
                for pdf in chunks
                for s in pdf["_sig"]
                if s is not None
            ]
            if sigs:
                n_batch = len(sigs)
                batch_sig = np.minimum.reduce(sigs)
                uref = ref.view(np.uint64)
                if ref.size:
                    merged_u = np.minimum(uref, batch_sig)
                    # agreement(batch, history) estimates J(B, H);
                    # agreement(batch, merged) estimates J(B, B∪H) =
                    # |B|/|B∪H|, so their ratio estimates containment
                    # |B∩H|/|B| — batch-normalized, immune to the
                    # Jaccard shrink as history outgrows batches (r13
                    # advice). Slotwise batch==history ⟹ batch==merged,
                    # so agree <= b_in_union and the ratio stays <= 1;
                    # the 1/num_hashes floor is the estimator's
                    # resolution limit (see docstring).
                    agree = float(np.mean(uref == batch_sig))
                    b_in_union = float(np.mean(batch_sig == merged_u))
                    containment = min(
                        agree / max(b_in_union, 1.0 / num_hashes), 1.0
                    )
                    merged = merged_u.view(np.int64)
                else:
                    agree = 0.0
                    containment = 0.0
                    merged = batch_sig.view(np.int64)
                n_total += n_batch
                row = {
                    "group": key[0],
                    "n_batch": n_batch,
                    "n_total": n_total,
                    "est_jaccard": agree,
                    "est_containment": containment,
                    "novelty": 1.0 - containment,
                }
                if snapshot_on_timeout:
                    row["snapshot"] = None
                    row["sig_shingle_k"] = None
                outs.append(pd.DataFrame([row]))
                ref = merged

        state.update(([int(x) for x in ref], n_total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return keyed.groupBy("group").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_CARD_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
