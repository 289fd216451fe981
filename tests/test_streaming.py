"""Streaming-tier tests: live subscription, stop-on-inactive, windows."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from ella_spark import Column, Ella


@pytest.fixture()
def db(spark, tmp_path):
    return Ella.create(str(tmp_path / "sdb"), spark)


def test_subscribe_sees_live_publishes(db, spark):
    """History then live: rows published after the subscription starts
    arrive in micro-batches (TopicExec 3-tier union semantics,
    topic.rs:165-203)."""
    from ella_spark.streaming import (
        TrackedPublisher,
        active_publishers,
        subscribe_to_memory,
        wait_stop_on_inactive,
    )

    topic = db.create_topic("live", [Column("v", "int64")])
    # history tier
    with TrackedPublisher(topic) as pub:
        pub.write(1_000, 1)

    query = subscribe_to_memory(topic, spark, name="sub_live_t")
    pub = TrackedPublisher(topic)
    assert active_publishers(topic) == 1
    pub.write(2_000, 2)
    pub.flush()
    pub.write(3_000, 3)
    pub.close()
    assert active_publishers(topic) == 0

    wait_stop_on_inactive(topic, query, timeout_sec=30)
    out = spark.sql("SELECT v FROM sub_live_t ORDER BY v").toPandas()
    assert list(out["v"]) == [1, 2, 3]


def test_streaming_query_is_unbounded(db, spark):
    db.create_topic("live2", [Column("v", "int64")])
    stream = db.subscribe("live2")
    assert stream.isStreaming


def test_tumbling_window_agg(db):
    """Windowed aggregation over ns time (beyond-reference: the
    reference only has date_bin group-bys, §F)."""
    import pyspark.sql.functions as F

    from ella_spark.streaming import tumbling

    topic = db.create_topic("win", [Column("v", "float64")])
    ns = 1_000_000_000
    with topic.publish() as pub:
        for i, v in [(0, 1.0), (1, 2.0), (5, 10.0), (6, 20.0)]:
            pub.write(i * ns, v)
    df = topic.read(db.spark)
    out = (
        tumbling(df, "5 seconds")
        .agg(F.sum("v").alias("s"))
        .orderBy("window.start")
        .toPandas()
    )
    assert list(out["s"]) == [3.0, 30.0]


def test_session_window(db):
    import pyspark.sql.functions as F

    from ella_spark.streaming import session_window

    topic = db.create_topic("sess", [Column("u", "int64", required=True)])
    ns = 1_000_000_000
    with topic.publish() as pub:
        # user 1: two bursts separated by >10s gap
        for t in (0, 1, 2, 30, 31):
            pub.write(t * ns, 1)
    df = topic.read(db.spark)
    out = (
        session_window(df, "10 seconds", ["u"])
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    assert sorted(out["n"]) == [2, 3]


def test_stateful_running_stats(db, spark):
    """applyInPandasWithState: per-key state must accumulate ACROSS
    micro-batches (beyond-reference custom stateful operator)."""
    import pyspark.sql.functions as F

    from ella_spark.streaming.stateful import running_stats_per_key

    topic = db.create_topic(
        "stateful", [Column("k", "string", required=True), Column("v", "float64")]
    )
    ns = 1_000_000_000
    with topic.publish() as pub:  # micro-batch 1 (one shard)
        pub.write(1 * ns, "a", 1.0)
        pub.write(2 * ns, "a", 3.0)
        pub.write(3 * ns, "b", 10.0)

    out = running_stats_per_key(db.subscribe("stateful"), "k", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "stateful_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:  # micro-batch 2 (new shard)
            pub.write(4 * ns, "a", 2.0)
        q.processAllAvailable()
        pdf = spark.sql(
            "SELECT * FROM stateful_out"
        ).toPandas()
        # last update per key wins
        last = pdf.sort_index().groupby("key").last()
        assert last.loc["a", "n"] == 3
        assert last.loc["a", "total"] == 6.0
        assert last.loc["a", "v_min"] == 1.0 and last.loc["a", "v_max"] == 3.0
        assert last.loc["a", "last_v"] == 2.0  # state carried across batches
        assert last.loc["b", "n"] == 1 and last.loc["b", "last_v"] == 10.0
    finally:
        q.stop()


def test_unified_scan_history_then_live(db, spark):
    """Fixture mirror of the reference pubsub example
    (ella-engine/examples/pubsub.rs:43-82): pre-existing rows, then a
    no-predicate scan sees history AND rows published while it runs,
    and terminates when the last publisher closes."""
    import threading

    from ella_spark.streaming import TrackedPublisher

    topic = db.create_topic("pubsub", [Column("v", "int64")])
    with TrackedPublisher(topic) as pub:  # history tier
        pub.write(1_000, 1)
        pub.write(2_000, 2)

    live = TrackedPublisher(topic)

    def publish_live():
        time.sleep(0.5)
        live.write(3_000, 3)
        live.flush()
        time.sleep(0.5)
        live.write(4_000, 4)
        live.close()  # → stop_on_inactive fires

    t = threading.Thread(target=publish_live)
    t.start()
    rows = list(db.scan("pubsub", mode="auto", timeout_sec=60))
    t.join()
    assert sorted(r.v for r in rows) == [1, 2, 3, 4]
    # history arrived before the rows published mid-scan
    assert [r.v for r in rows[:2]] == [1, 2]


def test_scan_live_mode_skips_history(db, spark):
    import threading

    from ella_spark.streaming import TrackedPublisher

    topic = db.create_topic("liveonly", [Column("v", "int64")])
    with TrackedPublisher(topic) as pub:
        pub.write(1_000, 1)  # history — must NOT appear

    live = TrackedPublisher(topic)

    def publish_live():
        time.sleep(0.5)
        live.write(time.time_ns() + 10_000_000_000, 42)
        live.close()

    t = threading.Thread(target=publish_live)
    t.start()
    rows = list(db.scan("liveonly", mode="live", timeout_sec=60))
    t.join()
    assert [r.v for r in rows] == [42]


def test_query_now_substitution(db):
    """`WHERE time < now()` = bounded history cut (README.md:96-105)."""
    topic = db.create_topic("nowq", [Column("v", "int64")])
    with topic.publish() as pub:
        pub.write(1_000, 1)  # 1970-era: far in the past
        pub.write(time.time_ns() + 3_600_000_000_000, 2)  # 1h in the future
    out = db.query("SELECT v FROM nowq WHERE time < now()").execute()
    assert list(out["v"]) == [1]


def test_streaming_dedup_across_batches(db, spark):
    """First row per key wins; duplicates in LATER micro-batches drop;
    watermark bounds state (beyond-reference streaming dedup)."""
    from ella_spark.streaming import streaming_dedup

    topic = db.create_topic(
        "sdedup", [Column("k", "string", required=True), Column("v", "int64")]
    )
    ns = 1_000_000_000
    with topic.publish() as pub:  # micro-batch 1
        pub.write(1 * ns, "a", 1)
        pub.write(2 * ns, "b", 2)
        pub.write(3 * ns, "a", 99)  # same-batch dup
    out = streaming_dedup(db.subscribe("sdedup"), ["k"], "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "sdedup_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:  # micro-batch 2: cross-batch dups
            pub.write(4 * ns, "a", 100)
            pub.write(5 * ns, "c", 3)
        q.processAllAvailable()
        pdf = spark.sql("SELECT k, v FROM sdedup_out").toPandas()
        got = dict(zip(pdf["k"], pdf["v"]))
        assert got == {"a": 1, "b": 2, "c": 3}
    finally:
        q.stop()


def test_unified_scan_lag_error(db, spark):
    """Slow-subscriber Lagged error parity (channel.rs:289-294): a
    consumer that falls further behind than the bound errors instead
    of buffering without limit."""
    from ella_spark.streaming import Lagged, TrackedPublisher, unified_scan

    topic = db.create_topic("laggy", [Column("v", "int64")])
    live = TrackedPublisher(topic)  # stays open → the scan keeps polling
    try:
        for i in range(10):  # more pending rows than the bound
            live.write(i * 1_000, i)
        live.flush()
        gen = unified_scan(topic, spark, max_lag_rows=3, timeout_sec=30)
        with pytest.raises(Lagged, match="lagged"):
            list(gen)
    finally:
        live.close()


def test_unified_scan_collected_volume_is_linear(db, spark):
    """The subscriber tail collects each micro-batch ONCE (foreachBatch
    into a driver-side queue): total collected-row volume over a scan
    of n rows is exactly n. The previous memory-sink poll re-collected
    the whole table every tick — O(n²) over a long subscription."""
    import ella_spark.streaming as stg

    topic = db.create_topic("voln", [Column("v", "int64")])
    n = 10_000
    for chunk in range(10):  # 10 shards → several micro-batches
        with topic.publish() as pub:
            for i in range(1000):
                r = chunk * 1000 + i
                pub.write(r * 1000, r)
    before = stg._collected_rows_total
    rows = list(stg.unified_scan(topic, spark, timeout_sec=120))
    assert len(rows) == n
    assert sorted(r.v for r in rows) == list(range(n))
    assert stg._collected_rows_total - before == n


def test_continuous_rollup(db, spark):
    """foreachBatch-driven continuous aggregate: rollup refreshes as
    new shards stream in."""
    from ella_spark.streaming import continuous_rollup

    sec = 1_000_000_000
    topic = db.create_topic("croll", [Column("v", "float64")])
    with topic.publish() as pub:
        pub.write(1 * sec, 1.0)
        pub.write(61 * sec, 2.0)
    q = continuous_rollup(db, "croll", "croll_1m", 60 * sec)
    try:
        q.processAllAvailable()
        out = db.query("SELECT time, v_sum FROM croll_1m ORDER BY time").execute()
        assert list(out["v_sum"]) == [1.0, 2.0]
        with topic.publish() as pub:  # new shard → new micro-batch
            pub.write(62 * sec, 10.0)   # open bucket absorbs late row
            pub.write(130 * sec, 5.0)   # new bucket
        q.processAllAvailable()
        out = db.query("SELECT time, v_sum FROM croll_1m ORDER BY time").execute()
        assert list(out["v_sum"]) == [1.0, 12.0, 5.0]
    finally:
        q.stop()


def test_stream_stream_join(db, spark):
    """Watermarked stream-stream join: two live topics joined on key
    within an event-time bound; state is watermark-bounded so the
    query could run forever (beyond-reference §F)."""
    from ella_spark.streaming import stream_stream_join

    t1 = db.create_topic("ssj_a", [Column("k", "int64"), Column("a", "float64")])
    t2 = db.create_topic("ssj_b", [Column("k", "int64"), Column("b", "float64")])
    ns = 1_000_000_000
    # offset from epoch 0: a row whose event time EQUALS the initial
    # watermark (1970-01-01T00:00:00) is filtered as late input
    base = 3600
    with t1.publish() as pub:
        pub.write((base + 0) * ns, 1, 10.0)
        pub.write((base + 1) * ns, 2, 20.0)
        pub.write((base + 50) * ns, 3, 30.0)
    with t2.publish() as pub:
        pub.write((base + 2) * ns, 1, 100.0)
        pub.write((base + 3) * ns, 2, 200.0)
        pub.write((base + 120) * ns, 3, 300.0)  # 70s from left k=3: outside bound

    # watermark must cover the full replayed event-time spread (120s):
    # the history tier arrives across micro-batches, and a shorter
    # watermark would age out early-event join state before the other
    # side's file is read. k=3 is excluded by the JOIN BOUND, not the
    # watermark, so the assertion is batch-split-deterministic.
    joined = stream_stream_join(
        t1.read_stream(spark),
        t2.read_stream(spark),
        on=["k"],
        within="5 seconds",
        watermark="10 minutes",
    )
    assert joined.isStreaming
    query = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .option(
            "checkpointLocation",
            str(t1.store.meta_dir / "checkpoints" / "ssj_out"),
        )
        .start()
    )
    query.processAllAvailable()
    query.stop()
    out = spark.sql("SELECT k, a, b FROM ssj_out ORDER BY k").toPandas()
    assert list(out["k"]) == [1, 2]
    assert list(out["a"]) == [10.0, 20.0]
    assert list(out["b"]) == [100.0, 200.0]

    # unified batch/stream semantics: same helper on batch reads
    batch = stream_stream_join(
        t1.read(spark), t2.read(spark), on=["k"], within="5 seconds"
    )
    assert not batch.isStreaming
    assert sorted(r["k"] for r in batch.collect()) == [1, 2]


def test_curate_stream_matches_batch(db, spark):
    """pipelines.curate_stream on a live doc topic == pipelines.curate
    on the same rows (duplicates published in doc_id order so the
    first-wins and min-id survivors coincide)."""
    from ella_spark.pipelines import curate, curate_stream

    topic = db.create_topic(
        "cdocs",
        [
            Column("doc_id", "int64", required=True),
            Column("lang", "string"),
            Column("n_chars", "int64"),
            Column("text", "string"),
        ],
    )
    ns = 1_000_000_000
    rows = []
    for i in range(40):
        text = f"document body number {i % 30} " * 10  # ids 30-39 duplicate 0-9
        rows.append((i * ns, i, "en" if i % 2 else "de", len(text), text))
    rows.append((41 * ns, 41, "en", 5, "tiny"))  # fails min_chars gate
    with topic.publish() as pub:
        for r in rows:
            pub.write(*r)

    bench = spark.createDataFrame(
        [(r[4],) for r in rows if r[1] < 3], "text string"
    )
    out = curate_stream(
        db.subscribe("cdocs"), benchmark=bench, keep_permille=1000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("curate_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "curate_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.doc_id for r in spark.sql("SELECT * FROM curate_out").collect()
        }
    finally:
        q.stop()

    static = db.query("SELECT * FROM cdocs").df
    want = {
        r.doc_id
        for r in curate(static, benchmark=bench, keep_permille=1000).collect()
    }
    assert got == want
    assert 41 not in got            # char gate
    assert not ({0, 1, 2} & got)    # decontaminated
    assert 3 in got and 33 not in got  # dup of 3 dropped, original kept


def test_ewma_stream_matches_batch(db, spark):
    """Streaming EWMA (3-scalar state per key) across TWO micro-batches
    equals the batch ordered fold over the quiesced topic — the
    incremental-form contract of q_ewma."""
    import pyspark.sql.functions as F

    from ella_spark.streaming.stateful import ewma_per_key

    topic = db.create_topic(
        "ewt",
        [
            Column("k", "string", required=True),
            Column("i", "int64"),
            Column("v", "float64"),
        ],
    )
    ns = 1_000_000_000
    with topic.publish() as pub:
        pub.write(1 * ns, "a", 1, 10.0)
        pub.write(2 * ns, "a", 2, 20.0)
        pub.write(1 * ns, "b", 3, 4.0)

    out = ewma_per_key(db.subscribe("ewt"), "k", "v", order_col="i")
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("update")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "ewma_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:  # micro-batch 2: state must carry
            pub.write(3 * ns, "a", 4, 40.0)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM ewma_out").toPandas()
        last = pdf.sort_index().groupby("key").last()
        # batch ground truth: fold acc = acc/2 + x/2 in time order
        # a: 10 -> 15 -> 27.5 ; b: 4
        assert last.loc["a", "n"] == 3 and last.loc["a", "ewma"] == 27.5
        assert last.loc["b", "ewma"] == 4.0
        # and equals the batch fold computed over the quiesced topic
        df = topic.read(db.spark)
        batch = (
            df.groupBy("k")
            .agg(F.array_sort(F.collect_list(F.struct("time", "i", "v"))).alias("r"))
            .select(
                "k",
                F.aggregate(
                    F.expr("slice(transform(r, x -> x.v), 2, size(r) - 1)"),
                    F.expr("element_at(transform(r, x -> x.v), 1)"),
                    lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
                ).alias("ewma"),
            )
        )
        got = {r["k"]: r["ewma"] for r in batch.collect()}
        assert got == {k: last.loc[k, "ewma"] for k in got}
    finally:
        q.stop()


def test_sessionize_stream_matches_batch(db, spark):
    """Streaming sessionization across TWO micro-batches: closed
    sessions emitted by the stateful operator equal the batch
    q_sessionize_stats identity over the quiesced topic, minus each
    key's final (still-open) session — the incremental-form contract
    of the round-7 batch query."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ella_spark.streaming.stateful import sessionize_per_key

    topic = db.create_topic(
        "sst",
        [Column("k", "string", required=True), Column("v", "float64")],
    )
    mn = 60 * 1_000_000_000  # ns per minute
    with topic.publish() as pub:
        # key a: events at t=0,10 | gap>30min | 50,55 (batch 1)
        pub.write(0 * mn, "a", 1.0)
        pub.write(10 * mn, "a", 2.0)
        pub.write(50 * mn, "a", 3.0)
        pub.write(55 * mn, "a", 4.0)
        # key b: one lone event
        pub.write(5 * mn, "b", 10.0)

    out = sessionize_per_key(db.subscribe("sst"), "k", "v", gap_ns=30 * mn)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "sess_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:  # batch 2: closes a's 2nd session
            pub.write(100 * mn, "a", 5.0)  # gap 45min > 30min
            pub.write(40 * mn, "b", 20.0)  # closes b's lone session
        q.processAllAvailable()
        got = {
            (r.key, r.session_seq): (r.start_ns, r.end_ns, r.n_events, r.value_sum)
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        # closed sessions only: a1 (0-10min), a2 (50-55min), b1 (5min)
        assert got == {
            ("a", 1): (0, 10 * mn, 2, 3.0),
            ("a", 2): (50 * mn, 55 * mn, 2, 7.0),
            ("b", 1): (5 * mn, 5 * mn, 1, 10.0),
        }

        # batch ground truth over the quiesced topic (the registry
        # query's exact construction), minus each key's last session
        df = topic.read(db.spark)
        w = Window.partitionBy("k").orderBy("time")
        wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        is_new = F.when(
            F.lag("time").over(w).isNull()
            | ((F.col("time") - F.lag("time").over(w)) > 30 * mn),
            1,
        ).otherwise(0)
        sess = (
            df.withColumn("seq", F.sum(is_new).over(wc))
            .groupBy("k", "seq")
            .agg(
                F.min("time").alias("start_ns"),
                F.max("time").alias("end_ns"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum("v").alias("value_sum"),
            )
        )
        last_seq = sess.groupBy("k").agg(F.max("seq").alias("seq"))
        closed_batch = sess.join(last_seq, ["k", "seq"], "left_anti")
        want = {
            (r.k, r.seq): (r.start_ns, r.end_ns, r.n_events, r.value_sum)
            for r in closed_batch.collect()
        }
        assert got == want
    finally:
        q.stop()


def test_heavy_hitters_stream_matches_batch_exact_regime(db, spark):
    """Streaming Misra-Gries heavy hitters across TWO micro-batches:
    with distinct values per key <= counters nothing evicts, so the
    final emitted summary equals an exact groupBy count over the
    quiesced topic (the stream==batch identity, exact regime)."""
    import pyspark.sql.functions as F

    from ella_spark.streaming.stateful import heavy_hitters_per_key

    topic = db.create_topic(
        "hht",
        [Column("k", "string", required=True), Column("item", "string")],
    )
    ns = 1_000_000_000
    with topic.publish() as pub:
        for i, item in enumerate(["x", "x", "y", "z", "x"]):
            pub.write((i + 1) * ns, "a", item)
        pub.write(6 * ns, "b", "q")

    out = heavy_hitters_per_key(db.subscribe("hht"), "k", "item", counters=8)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "hh_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:  # batch 2: state must carry
            pub.write(7 * ns, "a", "y")
            pub.write(8 * ns, "b", "q")
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM hh_out").toPandas()
        # last emission per (key, value)
        last = (
            pdf.reset_index()
            .sort_values("index")
            .groupby(["key", "value"])
            .last()["approx_count"]
        )
        got = {(k, v): int(c) for (k, v), c in last.items()}
        exact = {
            (r.k, r.item): r.c
            for r in topic.read(db.spark)
            .groupBy("k", "item")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        assert got == exact
    finally:
        q.stop()


def test_heavy_hitters_stream_eviction_bound():
    """Eviction regime: fold a value stream through the MG updater
    with a fake state and check the classic undercount bound — every
    reported count within n_seen/(counters+1) of the true count, and
    every value with true count > n_seen/(counters+1) present."""
    import pandas as pd

    from ella_spark.streaming.stateful import heavy_hitters_per_key  # noqa: F401
    from ella_spark.operators.sketch import _mg_update

    c = 4
    vals = (["hot"] * 40 + ["warm"] * 12 + [f"v{i}" for i in range(30)] * 2)
    true = pd.Series(vals).value_counts().to_dict()
    summary: dict = {}
    # two "micro-batches", like the streaming fold
    for chunk in (vals[:50], vals[50:]):
        _mg_update(summary, pd.Series(chunk).value_counts().to_dict(), c)
    n = len(vals)
    bound = n / (c + 1)
    for v, cnt in summary.items():
        assert true[v] - cnt <= bound and cnt <= true[v]
    for v, t in true.items():
        if t > bound:
            assert v in summary, v


def test_rolling_zscore_stream_matches_batch(db, spark):
    """Streaming rolling z-score across TWO micro-batches equals the
    batch RANGE-window computation over the quiesced topic — the
    incremental-form contract of q_rolling_zscore, same int64
    centi-unit arithmetic, same n>=3 / positive-variance gates."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ella_spark.streaming.stateful import rolling_zscore_per_key

    topic = db.create_topic(
        "rzt",
        [Column("k", "string", required=True), Column("v", "float64")],
    )
    mn = 60 * 1_000_000_000
    hour = 3600 * 1_000_000_000
    # key a: a dense hour, then a far event whose window excludes the
    # start; key b: too sparse to ever fire
    batch1 = [
        (0 * mn, "a", 10.0), (10 * mn, "a", 12.5), (20 * mn, "a", 11.0),
        (30 * mn, "a", 55.5), (0 * mn, "b", 1.0),
    ]
    with topic.publish() as pub:
        for t, k, v in batch1:
            pub.write(t, k, v)

    out = rolling_zscore_per_key(
        db.subscribe("rzt"), "k", "v", window_ns=hour, min_n=3
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rz_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "rz_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:  # batch 2: state must carry
            pub.write(70 * mn, "a", 13.0)   # window drops the t=0 event
            pub.write(120 * mn, "b", 2.0)
        q.processAllAvailable()
        got = (
            spark.sql("SELECT key, ts, z FROM rz_out")
            .toPandas()
            .sort_values(["key", "ts"])
            .reset_index(drop=True)
        )
        # batch ground truth: the q_rolling_zscore window shape
        df = topic.read(db.spark).select(
            F.col("k").alias("key"),
            F.col("time").alias("ts"),
            "v",
            F.floor(F.col("v") * 100 + 0.5).cast("bigint").alias("vc"),
        )
        win = Window.partitionBy("key").orderBy("ts").rangeBetween(-hour, 0)
        w = df.withColumns(
            {
                "n": F.count(F.lit(1)).over(win),
                "s": F.sum("vc").over(win),
                "sq": F.sum(F.col("vc") * F.col("vc")).over(win),
            }
        )
        n, s, sq = F.col("n"), F.col("s"), F.col("sq")
        z = (F.col("v") - s.cast("double") / (100 * n)) / F.sqrt(
            (n * sq - s * s).cast("double") / (F.lit(10000.0) * n * (n - 1))
        )
        want = (
            w.where((n >= 3) & (n * sq > s * s))
            .select("key", "ts", z.alias("z"))
            .toPandas()
            .sort_values(["key", "ts"])
            .reset_index(drop=True)
        )
        assert len(want) > 0  # the scenario actually fires
        import pandas as pd

        pd.testing.assert_frame_equal(got, want)  # bit-identical doubles
    finally:
        q.stop()


def test_winsorize_stream_matches_batch_exact_regime(db, spark):
    """Streaming KLL-state winsorize: with all of a group's values in
    one micro-batch and n <= k (no compaction), the emitted clips equal
    the batch q_winsorize order-statistic clip exactly; a second
    micro-batch updates the bounds over ALL seen values (state carry)."""
    import math

    import pandas as pd

    from ella_spark.streaming.stateful import winsorize_per_group

    topic = db.create_topic(
        "wzt",
        [Column("g", "string", required=True), Column("i", "int64"),
         Column("v", "float64")],
    )
    ns = 1_000_000_000
    vals = [float(x) for x in range(1, 41)]  # 1..40: c=2, bounds 2 and 39
    with topic.publish() as pub:
        for i, v in enumerate(vals):
            pub.write((i + 1) * ns, "g1", i, v)

    out = winsorize_per_group(
        db.subscribe("wzt"), "g", "v", id_col="i", lo=0.05, k=256
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wz_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "wz_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM wz_out").toPandas()

        def exact_clips(seen, batch_ids, batch_vals):
            s = sorted(seen)
            n = len(s)
            c = math.ceil(n * 0.05)
            lo_b, hi_b = s[c - 1], s[n - c]
            return {
                i: (max(min(v, hi_b), lo_b), lo_b, hi_b)
                for i, v in zip(batch_ids, batch_vals)
                if v < lo_b or v > hi_b
            }

        want1 = exact_clips(vals, range(len(vals)), vals)
        got1 = {
            int(r.id): (r.v_clipped, r.lo_bound, r.hi_bound)
            for r in pdf.itertuples()
        }
        assert got1 == want1  # 1.0 clipped to 2.0, 40.0 clipped to 39.0

        # batch 2: outliers against bounds over ALL 42 values seen
        with topic.publish() as pub:
            pub.write(100 * ns, "g1", 100, 0.5)
            pub.write(101 * ns, "g1", 101, 20.0)
        q.processAllAvailable()
        pdf2 = spark.sql("SELECT * FROM wz_out").toPandas()
        new = pdf2[pdf2.id >= 100]
        want2 = exact_clips(vals + [0.5, 20.0], [100, 101], [0.5, 20.0])
        got2 = {
            int(r.id): (r.v_clipped, r.lo_bound, r.hi_bound)
            for r in new.itertuples()
        }
        assert got2 == want2  # only id=100 clipped, at the n=42 bounds
    finally:
        q.stop()


def test_psi_drift_stream_scores_batch_vs_reference(db, spark):
    """Streaming PSI monitor: the first micro-batch seeds the
    reference silently; the second batch's emitted PSI equals the
    hand-computed PSI of (batch2 histogram || batch1 histogram) with
    the q_psi_drift zero-bucket contract."""
    import numpy as np

    from ella_spark.streaming.stateful import psi_drift_per_group

    topic = db.create_topic(
        "psit",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    batch1 = [5.0, 15.0, 15.0, 25.0, 35.0, 45.0, 55.0, 65.0]
    batch2 = [5.0, 5.0, 75.0, 85.0]
    with topic.publish() as pub:
        for i, v in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", v)

    out = psi_drift_per_group(
        db.subscribe("psit"), "g", "v", lo_edge=0.0, hi_edge=100.0, buckets=10
    )
    q = (
        out.writeStream.format("memory")
        .queryName("psi_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "psi_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM psi_out").count() == 0  # seeding

        with topic.publish() as pub:
            for i, v in enumerate(batch2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM psi_out").toPandas()
        assert len(pdf) == 1
        row = pdf.iloc[0]

        ref = np.bincount([int(v // 10) for v in batch1], minlength=10)
        cur = np.bincount([int(v // 10) for v in batch2], minlength=10)
        both = (ref > 0) & (cur > 0)
        p = cur[both] / cur.sum()
        qq = ref[both] / ref.sum()
        want = float(((p - qq) * np.log(p / qq)).sum())
        assert row.n_batch == 4 and row.n_ref == 8
        assert row.n_buckets == int(both.sum())
        assert abs(row.psi - want) < 1e-12
    finally:
        q.stop()


def test_rolling_zscore_idle_state_gc(db, spark):
    """idle_timeout_ms drops an idle key's retained window from the
    state store: after key a goes quiet past the timeout, the
    ProcessingTimeTimeout sweep removes its state, so a LATER event
    for key a that is INSIDE the event-time window of a's old rows
    starts from empty state and cannot fire (n resets below min_n).

    NOTE: with ProcessingTimeTimeout the micro-batch engine never goes
    idle (timeout sweeps are pending work), so processAllAvailable()
    would block forever — this test polls the sink instead.
    """
    from ella_spark.streaming.stateful import rolling_zscore_per_key

    topic = db.create_topic(
        "rzgc",
        [Column("k", "string", required=True), Column("v", "float64")],
    )
    mn = 60 * 1_000_000_000
    with topic.publish() as pub:
        for i, v in enumerate([10.0, 12.0, 14.0]):
            pub.write(i * mn, "a", v)  # n=3 at the third event -> fires

    out = rolling_zscore_per_key(
        db.subscribe("rzgc"), "k", "v",
        window_ns=3600 * 1_000_000_000, min_n=3, idle_timeout_ms=500,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rzgc_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "rzgc_out"),
        )
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM rzgc_out").collect()[0][0] >= n:
                return True
            time.sleep(0.5)
        return False

    def batches_done():
        p = q.lastProgress
        return p["batchId"] if p else -1

    try:
        assert wait_rows(1), "initial firing never arrived"
        # idle past the timeout; the continuously-running sweep drops
        # a's state (several batch ids must elapse to be sure)
        b0 = batches_done()
        deadline = time.time() + 60
        while batches_done() < b0 + 3 and time.time() < deadline:
            time.sleep(0.5)
        # a's next event is inside the event-time window of its old
        # rows — only state GC can explain it not firing
        with topic.publish() as pub:
            pub.write(3 * mn, "a", 16.0)
        b1 = batches_done()
        deadline = time.time() + 60
        while batches_done() < b1 + 3 and time.time() < deadline:
            time.sleep(0.5)
        rows = spark.sql("SELECT key, ts FROM rzgc_out").toPandas()
        assert len(rows) == 1, rows  # still only the original firing
        assert (rows.key == "a").all() and int(rows.ts.iloc[0]) == 2 * mn
    finally:
        q.stop()


def test_quantiles_stream_matches_batch_exact_regime(db, spark):
    """Streaming KLL quantiles: with n <= k nothing compacts, so the
    final emission equals DuckDB-rule quantile_disc computed directly
    over the quiesced topic; a second micro-batch updates the
    estimates over ALL seen values (state carry)."""
    from ella_spark.operators.sketch import kll_build, kll_quantiles
    from ella_spark.streaming.stateful import quantiles_per_group

    topic = db.create_topic(
        "qtt",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    vals1 = [float(x) for x in range(1, 21)]
    with topic.publish() as pub:
        for i, v in enumerate(vals1):
            pub.write((i + 1) * ns, "g1", v)

    out = quantiles_per_group(
        db.subscribe("qtt"), "g", "v", probs=(0.5, 0.95), k=256
    )
    q = (
        out.writeStream.format("memory")
        .queryName("qt_out")
        .outputMode("update")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "qt_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:  # batch 2: state must carry
            for i, v in enumerate([100.0, 200.0]):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM qt_out").toPandas()
        last = pdf.iloc[-1]
        all_vals = vals1 + [100.0, 200.0]
        want = kll_quantiles(kll_build(all_vals, k=256), [0.5, 0.95])
        assert last.n == 22
        assert list(last.quantiles) == want
        # exact regime: quantile_disc rule — rank ceil(p*n), 1-based
        import math

        s = sorted(all_vals)
        for p, got in zip((0.5, 0.95), last.quantiles):
            assert got == s[max(1, math.ceil(p * len(s))) - 1]
    finally:
        q.stop()


def test_rolling_zscore_out_of_order_chunks_within_batch(spark, tmp_path):
    """Regression (r9 ADVICE): a key whose micro-batch rows span
    multiple Arrow chunks OUT of event-time order must still be scored
    exactly. maxRecordsPerBatch=2 forces ~5 chunks for 9 rows written
    in REVERSE time order; the old per-chunk compute-and-evict set the
    eviction horizon from the first (latest-ts) chunk and dropped or
    under-counted every earlier-timestamped row that followed. The fix
    buffers all chunks, sorts once, computes once."""
    import os

    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ella_spark.streaming.stateful import rolling_zscore_per_key

    mn = 60 * 1_000_000_000
    hour = 3600 * 1_000_000_000
    rows = [("a", (8 - i) * 10 * mn, float(10 + ((7 * i) % 5))) for i in range(9)]
    src = tmp_path / "rz_ooo_src"
    src.mkdir()
    pd.DataFrame(rows, columns=["k", "t", "v"]).to_parquet(src / "p0.parquet")

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("t", LongType()),
            StructField("v", DoubleType()),
        ]
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = rolling_zscore_per_key(
            stream, "k", "v", time_col="t", window_ns=hour, min_n=3
        )
        q = (
            out.writeStream.format("memory")
            .queryName("rz_ooo")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "rz_ooo_cp"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = (
                spark.sql("SELECT key, ts, z FROM rz_ooo")
                .toPandas()
                .sort_values(["key", "ts"])
                .reset_index(drop=True)
            )
        finally:
            q.stop()

        df = spark.createDataFrame(rows, schema).select(
            F.col("k").alias("key"),
            F.col("t").alias("ts"),
            "v",
            F.floor(F.col("v") * 100 + 0.5).cast("bigint").alias("vc"),
        )
        win = Window.partitionBy("key").orderBy("ts").rangeBetween(-hour, 0)
        w = df.withColumns(
            {
                "n": F.count(F.lit(1)).over(win),
                "s": F.sum("vc").over(win),
                "sq": F.sum(F.col("vc") * F.col("vc")).over(win),
            }
        )
        n, s, sq = F.col("n"), F.col("s"), F.col("sq")
        z = (F.col("v") - s.cast("double") / (100 * n)) / F.sqrt(
            (n * sq - s * s).cast("double") / (F.lit(10000.0) * n * (n - 1))
        )
        want = (
            w.where((n >= 3) & (n * sq > s * s))
            .select("key", "ts", z.alias("z"))
            .toPandas()
            .sort_values(["key", "ts"])
            .reset_index(drop=True)
        )
        assert len(want) >= 6  # every row past the 3rd-in-time fires
        pd.testing.assert_frame_equal(got, want)  # bit-identical
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_chi2_drift_stream_scores_batch_vs_reference(db, spark):
    """Streaming chi² monitor (the categorical analog of the PSI
    test above): batch 1 seeds the reference silently; batch 2's
    emitted chi² equals the hand-computed goodness-of-fit statistic of
    batch 2's counts against batch 1's mix, novel categories counted
    separately; batch 3 then scores against batch1+batch2 folded —
    the history-BEFORE-batch contract."""
    from ella_spark.streaming.stateful import chi2_drift_per_group

    topic = db.create_topic(
        "chit",
        [Column("g", "string", required=True), Column("c", "string")],
    )
    ns = 1_000_000_000
    batch1 = ["a"] * 6 + ["b"] * 3 + ["c"] * 1
    batch2 = ["a"] * 2 + ["b"] * 2 + ["z"] * 1  # z never seen before
    with topic.publish() as pub:
        for i, c in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", c)

    out = chi2_drift_per_group(db.subscribe("chit"), "g", "c")
    q = (
        out.writeStream.format("memory")
        .queryName("chi2_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "chi2_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM chi2_out").count() == 0  # seeding

        with topic.publish() as pub:
            for i, c in enumerate(batch2):
                pub.write((100 + i) * ns, "g1", c)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM chi2_out").toPandas()
        assert len(pdf) == 1
        row = pdf.iloc[0]
        # hand-computed: ref mix a:.6 b:.3 c:.1 over n_ref=10; batch
        # n=5 -> e_a=3, e_b=1.5, e_c=0.5; z is novel (no expected
        # mass, no term); c absent from the batch contributes its
        # full expected mass (0-e_c)^2/e_c = e_c -- the standard
        # goodness-of-fit form over ALL reference categories
        want = (2 - 3.0) ** 2 / 3.0 + (2 - 1.5) ** 2 / 1.5 + 0.5
        assert row.n_batch == 5 and row.n_ref == 10
        assert row.dof == 2 and row.n_novel == 1 and row.n_missing == 1
        assert abs(row.chi2 - want) < 1e-12

        # batch 3 scores against batch1+batch2 FOLDED (a:8 b:5 c:1 z:1)
        batch3 = ["a"] * 3 + ["c"] * 3
        with topic.publish() as pub:
            for i, c in enumerate(batch3):
                pub.write((200 + i) * ns, "g1", c)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM chi2_out ORDER BY n_ref").toPandas()
        assert len(pdf) == 2
        row3 = pdf.iloc[1]
        n_ref = 15
        e_a, e_b = 6 * (8 / n_ref), 6 * (5 / n_ref)
        e_c, e_z = 6 * (1 / n_ref), 6 * (1 / n_ref)
        # b and z vanished from batch 3: each contributes its full
        # expected mass (the r9-ADVICE missing-category signal)
        want3 = (
            (3 - e_a) ** 2 / e_a
            + e_b
            + (3 - e_c) ** 2 / e_c
            + e_z
        )
        assert row3.n_ref == n_ref and row3.n_batch == 6
        assert row3.dof == 3 and row3.n_novel == 0 and row3.n_missing == 2
        assert abs(row3.chi2 - want3) < 1e-12
    finally:
        q.stop()


def test_ks_drift_stream_scores_batch_vs_reference(db, spark):
    """Streaming KS monitor: batch 1 seeds the reference silently;
    batch 2's emitted D equals the numpy brute-force sup of
    |ECDF_batch2 − ECDF_batch1| over the union of points; batch 3
    scores against batch1+batch2 folded — the history-before-batch
    contract shared with the PSI and chi² monitors."""
    import numpy as np

    from ella_spark.streaming.stateful import ks_drift_per_group

    def brute_d(batch, ref):
        grid = np.unique(np.concatenate([batch, ref]))
        fb = np.searchsorted(np.sort(batch), grid, side="right") / len(batch)
        fr = np.searchsorted(np.sort(ref), grid, side="right") / len(ref)
        return float(np.max(np.abs(fb - fr)))

    topic = db.create_topic(
        "kst",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    batch1 = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0]
    batch2 = [2.0, 6.0, 9.0, 9.0]
    batch3 = [1.0, 1.0, 4.0]
    with topic.publish() as pub:
        for i, v in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", v)

    out = ks_drift_per_group(db.subscribe("kst"), "g", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("ks_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "ks_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM ks_out").count() == 0  # seeding

        with topic.publish() as pub:
            for i, v in enumerate(batch2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM ks_out").toPandas()
        assert len(pdf) == 1
        row = pdf.iloc[0]
        assert row.n_batch == 4 and row.n_ref == 6
        assert abs(row.d_stat - brute_d(np.array(batch2), np.array(batch1))) < 1e-12

        with topic.publish() as pub:
            for i, v in enumerate(batch3):
                pub.write((200 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM ks_out ORDER BY n_ref").toPandas()
        assert len(pdf) == 2
        row3 = pdf.iloc[1]
        assert row3.n_ref == 10 and row3.n_batch == 3
        want = brute_d(np.array(batch3), np.array(batch1 + batch2))
        assert abs(row3.d_stat - want) < 1e-12
    finally:
        q.stop()


def test_page_hinkley_stream_matches_replay_and_alarms(db, spark):
    """Page-Hinkley across TWO micro-batches equals the pure-Python
    replay of the same (key, time)-ordered sequence (state carries
    n/total/m/min/max exactly), and a known mean shift fires alarm_up
    while the pre-shift batch stays quiet."""
    from ella_spark.streaming.stateful import page_hinkley_per_group

    topic = db.create_topic(
        "pht",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    batch1 = [10.0, 11.0, 9.0, 10.0, 10.5, 9.5]          # stable level
    batch2 = [30.0, 31.0, 29.0, 30.0, 30.0, 31.0, 29.5]  # shifted +20
    lam = 15.0

    def replay(seq):
        n, total, m, mn, mx = 0, 0.0, 0.0, 0.0, 0.0
        for x in seq:
            n += 1
            total += x
            m += x - total / n - 0.0
            mn = min(mn, m)
            mx = max(mx, m)
        return n, m - mn, mx - m

    with topic.publish() as pub:
        for i, v in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", v)

    out = page_hinkley_per_group(db.subscribe("pht"), "g", "v", lam=lam)
    q = (
        out.writeStream.format("memory")
        .queryName("ph_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "ph_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM ph_out").toPandas()
        assert len(pdf) == 1
        n1, up1, dn1 = replay(batch1)
        row = pdf.iloc[0]
        assert row.n == n1 == 6
        assert row.ph_up == up1 and row.ph_down == dn1  # bit-identical
        assert not row.alarm_up and not row.alarm_down  # quiet pre-shift

        with topic.publish() as pub:
            for i, v in enumerate(batch2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM ph_out ORDER BY n").toPandas()
        assert len(pdf) == 2
        n2, up2, dn2 = replay(batch1 + batch2)
        row2 = pdf.iloc[1]
        assert row2.n == n2 == 13
        assert row2.ph_up == up2 and row2.ph_down == dn2
        assert row2.alarm_up and not row2.alarm_down  # shift detected
    finally:
        q.stop()


def test_page_hinkley_delta_no_false_alarm_on_driftless_stream(db, spark):
    """Regression (r9 review): with delta > 0 a SINGLE shared
    accumulator drifts down by delta per observation on a driftless
    stream, guaranteeing a false alarm_down (simulated: fires at
    ~observation 95 with delta=0.5, lam=50). The two-accumulator form
    must stay quiet on 150 driftless observations and still raise
    alarm_up on a genuine +30 shift."""
    from ella_spark.streaming.stateful import page_hinkley_per_group

    topic = db.create_topic(
        "phd",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    with topic.publish() as pub:
        for i in range(150):  # stable around 10 (+/- 0.4, zero drift)
            pub.write((i + 1) * ns, "g1", 10.0 + (0.4 if i % 2 else -0.4))

    out = page_hinkley_per_group(
        db.subscribe("phd"), "g", "v", delta=0.5, lam=50.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("phd_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "phd_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM phd_out").toPandas()
        assert not pdf.alarm_up.any() and not pdf.alarm_down.any(), pdf

        with topic.publish() as pub:  # genuine upward shift
            for i in range(60):
                pub.write((1000 + i) * ns, "g1", 40.0)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM phd_out ORDER BY n").toPandas()
        last = pdf.iloc[-1]
        assert last.alarm_up and not last.alarm_down
    finally:
        q.stop()


def test_histogram_monitor_rejects_degenerate_bucket_args(spark):
    """ADVICE r10: width <= 0 or buckets < 1 silently produced a
    degenerate histogram (inf -> int64 cast -> everything clipped to
    bucket 0). The fixed-edge monitors must fail fast at build time,
    mirroring the SQL TVF layer's _positive_buckets guard."""
    import pytest

    from ella_spark.streaming.stateful import (
        js_drift_per_group,
        psi_drift_per_group,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    for fn in (psi_drift_per_group, js_drift_per_group):
        with pytest.raises(ValueError, match="hi_edge"):
            fn(stream, "value", "value", lo_edge=5.0, hi_edge=5.0)
        with pytest.raises(ValueError, match="hi_edge"):
            fn(stream, "value", "value", lo_edge=9.0, hi_edge=1.0)
        with pytest.raises(ValueError, match="buckets"):
            fn(stream, "value", "value", lo_edge=0.0, hi_edge=1.0, buckets=0)


def test_js_drift_stream_scores_batch_vs_reference(db, spark):
    """Streaming JS monitor: batch 1 seeds silently; batch 2's emitted
    JS equals the hand-computed Jensen-Shannon divergence of (batch2
    histogram || batch1 histogram) with the q_js_divergence zero-mass
    contract, bounded by ln 2 even on DISJOINT histograms (where PSI
    is undefined/infinite) — the reason JS completes the streaming
    family."""
    import math

    import numpy as np

    from ella_spark.streaming.stateful import js_drift_per_group

    topic = db.create_topic(
        "jst",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    batch1 = [5.0, 15.0, 15.0, 25.0]      # buckets 0, 1, 1, 2
    batch2 = [75.0, 85.0, 85.0, 95.0]     # buckets 7, 8, 8, 9 (disjoint!)
    with topic.publish() as pub:
        for i, v in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", v)

    out = js_drift_per_group(
        db.subscribe("jst"), "g", "v", lo_edge=0.0, hi_edge=100.0, buckets=10
    )
    q = (
        out.writeStream.format("memory")
        .queryName("js_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "js_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM js_out").count() == 0  # seeding

        with topic.publish() as pub:
            for i, v in enumerate(batch2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM js_out").toPandas()
        assert len(pdf) == 1
        row = pdf.iloc[0]
        # disjoint histograms: JS = ln 2 exactly (each side's terms
        # are p*ln(p/(p/2)) = p*ln 2 summing to ln 2 over both halves)
        assert row.n_batch == 4 and row.n_ref == 4
        assert abs(row.js - math.log(2)) < 1e-12

        # batch 3 scores against batch1+batch2 folded
        batch3 = [5.0, 15.0]  # buckets 0, 1
        with topic.publish() as pub:
            for i, v in enumerate(batch3):
                pub.write((200 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM js_out ORDER BY n_ref").toPandas()
        assert len(pdf) == 2
        row3 = pdf.iloc[1]
        ref = np.bincount(
            [int(v // 10) for v in batch1 + batch2], minlength=10
        ).astype(float)
        cur = np.bincount([int(v // 10) for v in batch3], minlength=10).astype(
            float
        )
        p, qq = cur / cur.sum(), ref / ref.sum()
        m = 0.5 * (p + qq)
        want = float(
            np.where(p > 0, 0.5 * p * np.log(p / m), 0.0).sum()
            + np.where(qq > 0, 0.5 * qq * np.log(qq / m), 0.0).sum()
        )
        assert row3.n_ref == 8 and row3.n_batch == 2
        assert abs(row3.js - want) < 1e-12
        assert 0.0 < row3.js < math.log(2)
    finally:
        q.stop()


def test_emd_drift_stream_scores_batch_vs_reference(db, spark):
    """Streaming EMD monitor: batch 1 seeds silently; batch 2's
    emitted EMD equals the numpy brute-force integral of
    |ECDF_batch2 - ECDF_batch1| over the union grid, and scales with
    SHIFT MAGNITUDE (a +20 shift scores exactly 20 where KS would
    saturate at 1) — the history-before-batch contract shared with
    the PSI/chi²/KS monitors."""
    import numpy as np

    from ella_spark.streaming.stateful import emd_drift_per_group

    def brute_emd(batch, ref):
        grid = np.unique(np.concatenate([batch, ref]))
        fb = np.searchsorted(np.sort(batch), grid, side="right") / len(batch)
        fr = np.searchsorted(np.sort(ref), grid, side="right") / len(ref)
        return float((np.abs(fb - fr)[:-1] * np.diff(grid)).sum())

    topic = db.create_topic(
        "emt",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    batch1 = [1.0, 2.0, 3.0, 4.0]
    batch2 = [21.0, 22.0, 23.0, 24.0]  # exact +20 shift
    with topic.publish() as pub:
        for i, v in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", v)

    out = emd_drift_per_group(db.subscribe("emt"), "g", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("emd_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "emd_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM emd_out").count() == 0  # seeding

        with topic.publish() as pub:
            for i, v in enumerate(batch2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM emd_out").toPandas()
        assert len(pdf) == 1
        row = pdf.iloc[0]
        assert row.n_batch == 4 and row.n_ref == 4
        assert abs(row.emd - 20.0) < 1e-12  # W1 of a pure +20 shift
        assert abs(row.emd - brute_emd(batch2, batch1)) < 1e-12

        # batch 3 scores against batch1+batch2 folded
        batch3 = [11.0, 12.0]
        with topic.publish() as pub:
            for i, v in enumerate(batch3):
                pub.write((200 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM emd_out ORDER BY n_ref").toPandas()
        assert len(pdf) == 2
        row3 = pdf.iloc[1]
        assert row3.n_ref == 8 and row3.n_batch == 2
        assert abs(row3.emd - brute_emd(batch3, batch1 + batch2)) < 1e-12
    finally:
        q.stop()


def test_auc_drift_stream_scores_batch_vs_reference(db, spark):
    """Streaming AUC monitor: batch 1 seeds silently; batch 2's
    emitted AUC equals the brute-force P(batch > ref) + 0.5*P(tie)
    over all pairs — 1.0 when every batch value exceeds the
    reference, 0.5 when the batch replays the reference exactly (all
    ties); batch 3 scores against batch1+batch2 folded — the
    history-before-batch contract of the KS/JS/EMD monitors."""
    from ella_spark.streaming.stateful import auc_drift_per_group

    def brute_auc(batch, ref):
        wins = sum(1 for b in batch for r in ref if b > r)
        ties = sum(1 for b in batch for r in ref if b == r)
        return (wins + 0.5 * ties) / (len(batch) * len(ref))

    topic = db.create_topic(
        "auct",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    batch1 = [1.0, 2.0, 3.0, 4.0]
    batch2 = [10.0, 20.0, 30.0]  # all above the reference -> AUC 1
    with topic.publish() as pub:
        for i, v in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", v)

    out = auc_drift_per_group(db.subscribe("auct"), "g", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("auc_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "auc_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM auc_out").count() == 0  # seeding

        with topic.publish() as pub:
            for i, v in enumerate(batch2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM auc_out").toPandas()
        assert len(pdf) == 1
        row = pdf.iloc[0]
        assert row.n_batch == 3 and row.n_ref == 4
        assert row.auc == 1.0 == brute_auc(batch2, batch1)

        # batch 3 replays history EXACTLY -> all comparisons resolve
        # by wins/ties against batch1+batch2: brute force pins it
        batch3 = [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0]
        with topic.publish() as pub:
            for i, v in enumerate(batch3):
                pub.write((200 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM auc_out ORDER BY n_ref").toPandas()
        assert len(pdf) == 2
        row3 = pdf.iloc[1]
        assert row3.n_ref == 7 and row3.n_batch == 7
        assert row3.auc == 0.5  # identical multiset: perfect ties
        assert abs(row3.auc - brute_auc(batch3, batch1 + batch2)) < 1e-12
    finally:
        q.stop()


def test_cardinality_drift_exact_below_k_and_dup_rate(db, spark):
    """Streaming KMV cardinality monitor, exact-when-fits regime:
    below k distinct hashes every emitted number is EXACT — batch 1
    (4 distinct) emits est_distinct=4 / est_new=4 / dup_rate=0;
    replaying the SAME batch emits est_new=0 / dup_rate=1 (the
    crawler-re-fetch signal); a half-overlapping batch lands exactly
    in between. Unlike the distribution monitors the FIRST batch
    already emits (a single batch has a well-defined cardinality)."""
    from ella_spark.streaming.stateful import cardinality_drift_per_group

    topic = db.create_topic(
        "cdt",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    batch1 = [1.0, 2.0, 3.0, 4.0]
    with topic.publish() as pub:
        for i, v in enumerate(batch1):
            pub.write((i + 1) * ns, "g1", v)

    out = cardinality_drift_per_group(db.subscribe("cdt"), "g", "v", k=64)
    q = (
        out.writeStream.format("memory")
        .queryName("card_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "card_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM card_out").toPandas()
        assert len(pdf) == 1
        r1 = pdf.iloc[0]
        assert r1.n_batch == 4 and r1.n_total == 4
        assert r1.est_distinct == 4.0 and r1.est_new == 4.0
        assert r1.dup_rate == 0.0

        # the SAME values again: nothing new, dup_rate saturates
        with topic.publish() as pub:
            for i, v in enumerate(batch1):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM card_out ORDER BY n_total").toPandas()
        assert len(pdf) == 2
        r2 = pdf.iloc[1]
        assert r2.n_total == 8 and r2.est_distinct == 4.0
        assert r2.est_new == 0.0 and r2.dup_rate == 1.0

        # half-overlap: 2 of 4 rows are new
        with topic.publish() as pub:
            for i, v in enumerate([3.0, 4.0, 5.0, 6.0]):
                pub.write((200 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM card_out ORDER BY n_total").toPandas()
        assert len(pdf) == 3
        r3 = pdf.iloc[2]
        assert r3.est_distinct == 6.0 and r3.est_new == 2.0
        assert r3.dup_rate == 0.5
    finally:
        q.stop()


def test_cardinality_drift_stream_fold_matches_batch_kmv(db, spark):
    """Past k distinct values the stream's estimate is pinned
    VALUE-IDENTICAL to the batch operator (kmv_sketch/kmv_estimate)
    on the concatenated history: same JVM xxhash64 in the keyed
    projection, same sorted bottom-k fold, same (k-1)/h_(k)
    estimator arithmetic — so a dashboard can mix the streaming
    monitor with batch backfills and the numbers agree."""
    import pyspark.sql.functions as F

    from ella_spark.operators.sketch import kmv_estimate, kmv_sketch
    from ella_spark.streaming.stateful import cardinality_drift_per_group

    topic = db.create_topic(
        "cdk",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    k = 8
    vals1 = [float(i) for i in range(20)]
    vals2 = [float(i) for i in range(15, 40)]  # overlaps 15..19
    with topic.publish() as pub:
        for i, v in enumerate(vals1):
            pub.write((i + 1) * ns, "g1", v)

    out = cardinality_drift_per_group(db.subscribe("cdk"), "g", "v", k=k)
    q = (
        out.writeStream.format("memory")
        .queryName("card_kmv")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "card_kmv"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:
            for i, v in enumerate(vals2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql(
            "SELECT * FROM card_kmv ORDER BY n_total"
        ).toPandas()
        assert len(pdf) == 2
        stream_est = float(pdf.iloc[1].est_distinct)

        # batch twin over the SAME topic rows (identical dtypes/hash)
        hist = db.query("SELECT g, v FROM cdk").df
        batch = kmv_estimate(kmv_sketch(hist, "g", "v", k=k), k=k).collect()
        assert len(batch) == 1
        assert batch[0].cnt == k  # estimator branch engaged, not exact
        assert stream_est == float(batch[0].est)  # bit-identical
    finally:
        q.stop()


def test_cardinality_drift_idle_state_gc(db, spark):
    """idle_timeout_ms drops an idle group's KMV sketch: after the
    group goes quiet past the timeout, replaying the SAME values
    re-seeds (est_new counts them as new again) — the documented
    history-reset trade for bounded state on high-churn group spaces.
    Polls the sink (ProcessingTimeTimeout keeps the engine busy, so
    processAllAvailable() would block forever — the rolling_zscore
    caveat)."""
    from ella_spark.streaming.stateful import cardinality_drift_per_group

    topic = db.create_topic(
        "cgc",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    with topic.publish() as pub:
        for i, v in enumerate([1.0, 2.0, 3.0]):
            pub.write((i + 1) * ns, "g1", v)

    out = cardinality_drift_per_group(
        db.subscribe("cgc"), "g", "v", k=64, idle_timeout_ms=500
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cgc_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "cgc_out"),
        )
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM cgc_out").collect()[0][0] >= n:
                return True
            time.sleep(0.5)
        return False

    def batches_done():
        p = q.lastProgress
        return p["batchId"] if p else -1

    try:
        assert wait_rows(1), "first batch never scored"
        # idle past the timeout: several sweep batches must elapse
        b0 = batches_done()
        deadline = time.time() + 60
        while batches_done() < b0 + 3 and time.time() < deadline:
            time.sleep(0.5)
        # the SAME values again: with the sketch GC'd this re-seeds
        with topic.publish() as pub:
            for i, v in enumerate([1.0, 2.0, 3.0]):
                pub.write((100 + i) * ns, "g1", v)
        assert wait_rows(2), "post-GC batch never scored"
        pdf = spark.sql(
            "SELECT * FROM cgc_out ORDER BY n_total"
        ).toPandas()
        last = pdf.iloc[-1]
        # history reset: est_new == 3 (not 0) and n_total restarted
        assert last.est_new == 3.0 and last.dup_rate == 0.0
        assert last.n_total == 3
    finally:
        q.stop()


def test_cardinality_drift_snapshot_on_timeout_and_seed_restore(db, spark):
    """The snapshot/restore pair that removes the idle-GC footgun:
    (a) snapshot_on_timeout emits the GC'd group's sorted bottom-k
    sketch as a final row (n_batch=0, snapshot non-NULL; ordinary
    score rows carry snapshot=NULL), and (b) feeding those rows back
    via ``seed`` resumes the history — replaying the SAME values
    after a GC + restart scores est_new=0 / dup_rate=1.0 instead of
    re-seeding, with n_total continuing from the snapshot."""
    from ella_spark.streaming.stateful import cardinality_drift_per_group

    # contract: snapshots are emitted BY the GC — validated before the
    # stream is touched, so no DataFrame is needed to pin it
    with pytest.raises(ValueError, match="idle_timeout_ms"):
        cardinality_drift_per_group(None, "g", "v", snapshot_on_timeout=True)

    topic = db.create_topic(
        "csnap",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    with topic.publish() as pub:
        for i, v in enumerate([1.0, 2.0, 3.0]):
            pub.write((i + 1) * ns, "g1", v)

    out = cardinality_drift_per_group(
        db.subscribe("csnap"),
        "g",
        "v",
        k=64,
        idle_timeout_ms=500,
        snapshot_on_timeout=True,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("csnap_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "csnap_out"),
        )
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if (
                spark.sql("SELECT count(*) FROM csnap_out").collect()[0][0]
                >= n
            ):
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_rows(1), "first batch never scored"
        # idle past the timeout: the GC must EMIT the sketch
        assert wait_rows(2), "snapshot row never emitted"
        pdf = spark.sql(
            "SELECT * FROM csnap_out ORDER BY n_batch DESC"
        ).toPandas()
        score, snap = pdf.iloc[0], pdf.iloc[-1]
        assert score.n_batch == 3 and score.snapshot is None
        assert snap.n_batch == 0 and snap.n_total == 3
        assert snap.est_distinct == 3.0
        # markers carry the k the snapshot was cut at (exact seed
        # validation, r13 advice); data rows leave it NULL
        assert snap.sketch_k == 64 and pd.isna(score.sketch_k)
        # marker-row scores are NULL, not 0.0 — a last-value-per-group
        # dashboard must not read a GC as "all-new content"
        assert pd.isna(snap.est_new) and pd.isna(snap.dup_rate)
        hashes = list(snap.snapshot)
        assert len(hashes) == 3 and hashes == sorted(hashes)

        # SAME-RUN resume after the GC: the O(1) tombstone keeps the
        # counter, so n_total continues (6) instead of rewinding —
        # only novelty is reset (the hashes are gone, est_new == 3)
        with topic.publish() as pub:
            for i, v in enumerate([1.0, 2.0, 3.0]):
                pub.write((50 + i) * ns, "g1", v)
        assert wait_rows(3), "post-GC same-run batch never scored"
        pdf = spark.sql(
            "SELECT * FROM csnap_out WHERE n_batch > 0 ORDER BY n_total"
        ).toPandas()
        resumed = pdf.iloc[-1]
        assert resumed.n_total == 6 and resumed.est_new == 3.0
    finally:
        q.stop()

    # restore: persisted snapshot rows ARE the seed frame (there may
    # be one or two by now — the tombstoned group re-registered its
    # timeout on the same-run resume, so a second, newer snapshot can
    # race in before q.stop(); seed picks the largest n_total)
    seed = spark.sql(
        "SELECT group, snapshot, n_total FROM csnap_out "
        "WHERE snapshot IS NOT NULL"
    )
    seed_n = max(r.n_total for r in seed.collect())
    # replay the SAME values (the fresh checkpoint also re-reads the
    # original three — all six rows are previously-seen)
    with topic.publish() as pub:
        for i, v in enumerate([1.0, 2.0, 3.0]):
            pub.write((100 + i) * ns, "g1", v)
    out2 = cardinality_drift_per_group(
        db.subscribe("csnap"), "g", "v", k=64, seed=seed
    )
    q2 = (
        out2.writeStream.format("memory")
        .queryName("csnap_out2")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "csnap_out2"),
        )
        .start()
    )
    try:
        q2.processAllAvailable()
        pdf = spark.sql(
            "SELECT * FROM csnap_out2 ORDER BY n_total"
        ).toPandas()
        assert len(pdf) >= 1
        last = pdf.iloc[-1]
        # restored history: nothing is new, totals CONTINUE (the
        # newest snapshot's count + every replayed row)
        assert last.est_distinct == 3.0
        assert last.est_new == 0.0 and last.dup_rate == 1.0
        assert last.n_total == seed_n + int(pdf.n_batch.sum())
    finally:
        q2.stop()


def test_tombstone_timeout_caps_group_space(db, spark):
    """tombstone_timeout_ms (r13 advice): by default the idle-GC's
    O(1) tombstones never expire, so state-entry count grows with
    total distinct groups ever seen. The second, longer timeout
    removes an expired tombstone outright — a group resuming AFTER
    that restarts fresh (n_total rewinds to its own rows; the history
    lives on in the first GC's marker row, restorable via seed),
    which is the documented tradeoff for capping group-space growth."""
    from ella_spark.streaming.stateful import cardinality_drift_per_group

    # contract: tombstones are created BY the idle GC
    with pytest.raises(ValueError, match="tombstone_timeout_ms"):
        cardinality_drift_per_group(None, "g", "v", tombstone_timeout_ms=5)

    topic = db.create_topic(
        "ctomb",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    with topic.publish() as pub:
        for i, v in enumerate([1.0, 2.0, 3.0]):
            pub.write((i + 1) * ns, "g1", v)
    out = cardinality_drift_per_group(
        db.subscribe("ctomb"),
        "g",
        "v",
        k=64,
        idle_timeout_ms=400,
        snapshot_on_timeout=True,
        tombstone_timeout_ms=800,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ctomb_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "ctomb_out"),
        )
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if (
                spark.sql("SELECT count(*) FROM ctomb_out").collect()[0][0]
                >= n
            ):
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_rows(1), "first batch never scored"
        assert wait_rows(2), "snapshot marker never emitted"
        # let the tombstone's own (second) timeout expire, with margin:
        # with a timeout configured the engine keeps triggering empty
        # micro-batches, which is what fires it without new data
        time.sleep(5)
        with topic.publish() as pub:
            for i, v in enumerate([1.0, 2.0, 3.0]):
                pub.write((50 + i) * ns, "g1", v)
        assert wait_rows(3), "post-expiry batch never scored"
        pdf = spark.sql(
            "SELECT * FROM ctomb_out WHERE n_batch > 0 ORDER BY n_total"
        ).toPandas()
        resumed = pdf.iloc[-1]
        # the tombstone is GONE: totals restart at the new batch's own
        # rows (a kept tombstone would have carried them to 6, the
        # same-run-resume case pinned in the snapshot/seed test)
        assert resumed.n_total == 3 and resumed.est_new == 3.0
    finally:
        q.stop()


def test_cardinality_seed_validation_and_history_builder(db, spark):
    """Build-time seed contracts (r12 review): a NULL n_total row is
    skipped like the other NULL guards (no bare TypeError), a snapshot
    taken SATURATED at a smaller prior k raises instead of being
    mis-read as exact, and cardinality_seed_from_history reproduces
    the exact kmv_sketch state (hashes + totals) from batch history —
    the full-coverage restore path for groups the GC never evicted."""
    import pyspark.sql.functions as F

    from ella_spark.operators.sketch import kmv_sketch
    from ella_spark.streaming.stateful import (
        cardinality_drift_per_group,
        cardinality_seed_from_history,
    )

    schema = (
        "group string, snapshot array<bigint>, n_total bigint, "
        "est_distinct double"
    )
    # row 1: NULL n_total (skipped); row 2: 2 hashes claiming ~50
    # distinct = saturated at a prior k of 2, restored into k=64
    bad = spark.createDataFrame(
        [("g0", [1, 2, 3], None, 3.0), ("g1", [10, 20], 7, 50.0)],
        schema,
    )
    with pytest.raises(ValueError, match="saturated at a smaller k"):
        cardinality_drift_per_group(None, "g", "v", k=64, seed=bad)
    # a set-churn sink carries est_union instead of est_distinct — the
    # guard must accept either saturation indicator (r12 review)
    with pytest.raises(ValueError, match="saturated at a smaller k"):
        cardinality_drift_per_group(
            None,
            "g",
            "v",
            k=64,
            seed=bad.withColumnRenamed("est_distinct", "est_union"),
        )

    # without est_distinct the ambiguity is undetectable by contract:
    # the same frame minus that column must load (g0 still skipped)
    cardinality_drift_per_group(
        _fake_stream_for_seed_check(spark),
        "g",
        "v",
        k=64,
        seed=bad.drop("est_distinct"),
    )

    # sketch_k makes the check EXACT (r13 advice): the estimator can
    # legitimately dip below the hash count on a saturated sketch, so
    # est=2.0 with 2 hashes would slip the heuristic — but sketch_k=2
    # says those 2 hashes ARE a full (saturated) k=2 sketch: reject.
    schema_k = (
        "group string, snapshot array<bigint>, n_total bigint, "
        "est_distinct double, sketch_k bigint"
    )
    sneaky = spark.createDataFrame(
        [("g1", [10, 20], 7, 2.0, 2)], schema_k
    )
    with pytest.raises(ValueError, match="sketch_k 2"):
        cardinality_drift_per_group(None, "g", "v", k=64, seed=sneaky)
    # and conversely: an UNSATURATED snapshot (3 hashes cut at k=8) is
    # exact and upsizes fine even when a stale estimate column would
    # have tripped the heuristic — sketch_k overrides the fallback
    exact = spark.createDataFrame(
        [("g1", [10, 20, 30], 7, 50.0, 8)], schema_k
    )
    cardinality_drift_per_group(
        _fake_stream_for_seed_check(spark), "g", "v", k=64, seed=exact
    )

    # the history builder == kmv_sketch + counts, exactly
    hist = spark.createDataFrame(
        [("a", float(i % 4)) for i in range(10)]
        + [("b", float(i)) for i in range(3)],
        "g string, v double",
    )
    got = {
        r.group: (list(r.snapshot), r.n_total)
        for r in cardinality_seed_from_history(hist, "g", "v", k=8).collect()
    }
    want_hashes = {
        r.grp: r.h
        for r in kmv_sketch(
            hist.select(F.col("g").cast("string").alias("g"), "v"),
            "g",
            "v",
            k=8,
        )
        .groupBy("grp")
        .agg(F.sort_array(F.collect_list("h")).alias("h"))
        .collect()
    }
    assert got["a"] == (list(want_hashes["a"]), 10)
    assert got["b"] == (list(want_hashes["b"]), 3)
    assert len(got["a"]) == 2 and len(got["a"][0]) == 4  # 4 distinct


def _fake_stream_for_seed_check(spark):
    """A real streaming frame the seed-loading path can select from —
    the query is never started, only built."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .selectExpr("CAST(value AS string) AS g", "CAST(value AS double) AS v")
    )


def test_set_churn_exact_regime_and_rotation_signal(db, spark):
    """Streaming set-churn monitor, exact-when-fits regime: the first
    batch scores novelty 1.0 (no history), replaying the SAME values
    scores containment 1.0 / novelty 0.0 (pure re-crawl), a
    half-overlapping batch lands exactly in between, and a fully
    DISJOINT batch — same distinct COUNT, rotated content — alarms at
    novelty 1.0 where the cardinality monitor's count signal alone
    would look like ordinary growth."""
    from ella_spark.streaming.stateful import set_churn_per_group

    # factory contract shared with the cardinality monitor
    with pytest.raises(ValueError, match="idle_timeout_ms"):
        set_churn_per_group(None, "g", "v", snapshot_on_timeout=True)

    topic = db.create_topic(
        "churn",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    out = set_churn_per_group(db.subscribe("churn"), "g", "v", k=64)
    q = (
        out.writeStream.format("memory")
        .queryName("churn_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "churn_out"),
        )
        .start()
    )
    try:
        def push(vals, t0):
            with topic.publish() as pub:
                for i, v in enumerate(vals):
                    pub.write((t0 + i) * ns, "g1", v)
            q.processAllAvailable()

        push([1.0, 2.0, 3.0, 4.0], 1)
        push([1.0, 2.0, 3.0, 4.0], 100)      # pure re-crawl
        push([3.0, 4.0, 5.0, 6.0], 200)      # half overlap
        push([10.0, 11.0, 12.0, 13.0], 300)  # full rotation
        pdf = spark.sql(
            "SELECT * FROM churn_out ORDER BY n_total"
        ).toPandas()
        assert len(pdf) == 4
        r1, r2, r3, r4 = (pdf.iloc[i] for i in range(4))
        assert r1.est_batch == 4.0 and r1.est_union == 4.0
        assert r1.jaccard == 0.0 and r1.novelty == 1.0
        assert r2.containment == 1.0 and r2.novelty == 0.0
        assert r2.jaccard == 1.0 and r2.est_union == 4.0
        # half overlap: union 6, inter 2 -> jaccard 1/3, containment .5
        assert r3.est_union == 6.0 and abs(r3.jaccard - 1 / 3) < 1e-12
        assert r3.containment == 0.5 and r3.novelty == 0.5
        # rotated content: same batch cardinality, fully novel
        assert r4.est_batch == 4.0 and r4.containment == 0.0
        assert r4.novelty == 1.0 and r4.est_union == 10.0
    finally:
        q.stop()


def test_set_churn_stream_matches_batch_kmv_overlap(db, spark):
    """Past k distinct values the stream's churn score is pinned
    VALUE-IDENTICAL to operators/sketch.kmv_overlap on (history,
    batch) framed as two groups: same JVM xxhash64, same bottom-k
    sketches, same Beyer merged-re-cut arithmetic — so a dashboard
    can mix the live monitor with batch overlap profiling."""
    from ella_spark.operators.sketch import kmv_overlap
    from ella_spark.streaming.stateful import set_churn_per_group

    topic = db.create_topic(
        "churnk",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    k = 8
    vals1 = [float(i) for i in range(20)]
    vals2 = [float(i) for i in range(15, 40)]  # overlaps 15..19
    with topic.publish() as pub:
        for i, v in enumerate(vals1):
            pub.write((i + 1) * ns, "g1", v)

    out = set_churn_per_group(db.subscribe("churnk"), "g", "v", k=k)
    q = (
        out.writeStream.format("memory")
        .queryName("churnk_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "churnk_out"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
        with topic.publish() as pub:
            for i, v in enumerate(vals2):
                pub.write((100 + i) * ns, "g1", v)
        q.processAllAvailable()
        pdf = spark.sql(
            "SELECT * FROM churnk_out ORDER BY n_total"
        ).toPandas()
        assert len(pdf) == 2
        row = pdf.iloc[1]

        # batch twin: history and batch as two groups of one frame
        two = spark.createDataFrame(
            [("hist", v) for v in vals1] + [("batch", v) for v in vals2],
            "grp string, v double",
        )
        ov = kmv_overlap(two, "grp", "v", k=k).collect()
        assert len(ov) == 1
        o = ov[0]
        assert float(row.jaccard) == float(o.jaccard)
        assert float(row.est_union) == float(o.union_est)
        # est_batch is the 'batch' side's own sketch estimate
        # (kmv_overlap orders grp_a < grp_b: 'batch' < 'hist')
        batch_est = o.est_a if o.grp_a == "batch" else o.est_b
        assert float(row.est_batch) == float(batch_est)
        # containment replays inter_est / est_batch exactly
        assert float(row.containment) == min(
            float(o.inter_est) / float(batch_est), 1.0
        )
    finally:
        q.stop()


def test_cardinality_gc_with_seed_keeps_totals_monotone(db, spark):
    """r12 review (high pass): with seed + idle_timeout_ms but NO
    snapshot_on_timeout, the GC must still leave the O(1) counter
    tombstone — a plain removal would send the post-GC resume back to
    the stale build-time seed and REWIND emitted n_total. Here the
    seed says n_total=100; after a 3-row batch (103), a GC, and a
    3-row resume, the monitor must emit 106, never 103 again."""
    from ella_spark.streaming.stateful import cardinality_drift_per_group

    seed = spark.createDataFrame(
        [("g1", [1, 2, 3], 100)],
        "group string, snapshot array<bigint>, n_total bigint",
    )
    topic = db.create_topic(
        "cmono",
        [Column("g", "string", required=True), Column("v", "float64")],
    )
    ns = 1_000_000_000
    with topic.publish() as pub:
        for i, v in enumerate([1.0, 2.0, 3.0]):
            pub.write((i + 1) * ns, "g1", v)

    out = cardinality_drift_per_group(
        db.subscribe("cmono"), "g", "v", k=64, idle_timeout_ms=500, seed=seed
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cmono_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "cmono_out"),
        )
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if (
                spark.sql("SELECT count(*) FROM cmono_out").collect()[0][0]
                >= n
            ):
                return True
            time.sleep(0.5)
        return False

    def batches_done():
        p = q.lastProgress
        return p["batchId"] if p else -1

    try:
        assert wait_rows(1), "first batch never scored"
        assert (
            spark.sql("SELECT max(n_total) FROM cmono_out").collect()[0][0]
            == 103
        )
        # idle past the timeout: several sweep batches must elapse
        b0 = batches_done()
        deadline = time.time() + 60
        while batches_done() < b0 + 3 and time.time() < deadline:
            time.sleep(0.5)
        with topic.publish() as pub:
            for i, v in enumerate([1.0, 2.0, 3.0]):
                pub.write((100 + i) * ns, "g1", v)
        assert wait_rows(2), "post-GC batch never scored"
        pdf = spark.sql(
            "SELECT * FROM cmono_out ORDER BY n_total"
        ).toPandas()
        # totals continue through the tombstone: 103 then 106 — a
        # rewind to the seed's 100 base would emit 103 twice
        assert list(pdf.n_total) == [103, 106]
    finally:
        q.stop()


def test_minhash_drift_stream_matches_batch_signatures(db, spark):
    """Value-identity pin for the similarity monitor: the history
    signature the stream folds (MinHash union law: slotwise min) must
    EQUAL the elementwise min of per-doc signatures from the
    PRODUCTION batch operator (shingle_minhash_udf — same
    _kgram_hashes/_mix64 chain), and each batch's est_jaccard must
    equal the slot-agreement fraction computed numpy-side from those
    signatures. Plus the semantics the monitor exists for: replaying
    the same text scores est_jaccard 1.0; disjoint text scores ~0;
    REWORDED text (the case the exact-set monitor calls fully novel)
    scores high. est_containment (r14, the r13-advice fix) is pinned
    to the slot-agreement-ratio replay — and the advice's exact
    scenario is pinned live: a tiny pure-replay batch against a
    much larger history scores est_jaccard LOW (union-normalized
    shrink) but est_containment 1.0 / novelty 0.0."""
    import numpy as np
    import pyspark.sql.functions as F

    from ella_spark.operators.dedup import shingle_minhash_udf
    from ella_spark.streaming.stateful import minhash_drift_per_group

    with pytest.raises(ValueError, match="idle_timeout_ms"):
        minhash_drift_per_group(None, "g", "t", snapshot_on_timeout=True)
    with pytest.raises(ValueError, match="idle_timeout_ms"):
        minhash_drift_per_group(None, "g", "t", tombstone_timeout_ms=5)
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_drift_per_group(None, "g", "t", num_hashes=1)

    NH, K = 64, 8
    b1 = [
        "the quick brown fox jumps over the lazy dog near the river",
        "a second document about spark structured streaming state",
        "short third text with enough characters to shingle",
    ]
    b2_rw = [
        "the quick brown fox jumps over the lazy dog near the creek",
        "a second document about spark structured streaming windows",
    ]
    b3_rot = [
        "zzz completely rotated corpus qqq unrelated ngrams xxyyzz",
        "vvv nothing shared with history wwww kkkjjj hhhhgg ffff",
    ]

    topic = db.create_topic(
        "mhd",
        [Column("g", "string", required=True), Column("txt", "string")],
    )
    ns = 1_000_000_000
    out = minhash_drift_per_group(
        db.subscribe("mhd"), "g", "txt", shingle_k=K, num_hashes=NH
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mhd_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "mhd_out"),
        )
        .start()
    )
    try:
        def push(texts, t0):
            with topic.publish() as pub:
                for i, t in enumerate(texts):
                    pub.write((t0 + i) * ns, "g1", t)
            q.processAllAvailable()

        # the 9-char doc has ONE shingle per slot draw, so ~half its
        # signature slots are >= 2^63 (negative as int64) — the case
        # where a SIGNED fold diverges from the unsigned MinHash
        # order (review-wave find, r13): it must fold correctly
        b5_short = ["cbebhhhgd"]
        push(b1, 1)
        push(b1, 100)      # exact replay
        push(b2_rw, 200)   # light rewording
        push(b3_rot, 300)  # full rotation
        push(b5_short, 400)  # negative-slot signature
        push(b1, 500)        # scored against short-doc-tainted history
        # the r13-advice scenario: ONE replayed doc against the (now
        # 6-doc-corpus) history — Jaccard shrinks toward |B|/|H| but
        # batch-normalized containment must stay exactly 1.0
        push([b1[0]], 600)
        pdf = spark.sql("SELECT * FROM mhd_out ORDER BY n_total").toPandas()
        assert len(pdf) == 7
        r1, r2, r3, r4, r5, r6, r7 = (pdf.iloc[i] for i in range(7))
        assert r1.n_batch == 3 and r1.est_jaccard == 0.0 and r1.novelty == 1.0
        assert r1.est_containment == 0.0
        # exact replay: identical batch/history signatures, exactly 1.0
        assert r2.est_jaccard == 1.0 and r2.est_containment == 1.0
        assert r2.novelty == 0.0
        # numpy reference signatures from the PRODUCTION batch UDF —
        # folds in UNSIGNED order (the _mix64 domain; int64 is just
        # the storage bit pattern), exactly like the monitor
        def batch_sigs(texts):
            smh = shingle_minhash_udf(K, NH)
            sdf = spark.createDataFrame(
                [(t,) for t in texts], "t string"
            ).select(smh(F.lower(F.trim("t"))).alias("s"))
            return np.array(
                [r.s.sig for r in sdf.collect()], dtype=np.int64
            ).view(np.uint64)

        hist_sig = batch_sigs(b1).min(axis=0)
        rw_sig = batch_sigs(b2_rw).min(axis=0)
        rot_sig = batch_sigs(b3_rot).min(axis=0)
        short_sig = batch_sigs(b5_short).min(axis=0)

        # the monitor's containment formula, replayed numpy-side:
        # C = J(B,H)/J(B,B∪H) with the 1/num_hashes resolution floor
        def cont(batch, hist):
            a = float(np.mean(batch == hist))
            b = float(np.mean(batch == np.minimum(batch, hist)))
            return min(a / max(b, 1.0 / NH), 1.0)

        # slot-agreement pins: the stream scored exactly these
        assert r3.est_jaccard == float(np.mean(hist_sig == rw_sig))
        assert r3.est_containment == cont(rw_sig, hist_sig)
        hist2 = np.minimum(hist_sig, rw_sig)
        assert r4.est_jaccard == float(np.mean(hist2 == rot_sig))
        assert r4.est_containment == cont(rot_sig, hist2)
        hist3 = np.minimum(hist2, rot_sig)
        assert int((short_sig >= 2**63).sum()) > 0  # the case is real
        assert r5.est_jaccard == float(np.mean(hist3 == short_sig))
        hist4 = np.minimum(hist3, short_sig)
        assert r6.est_jaccard == float(np.mean(hist4 == batch_sigs(b1).min(axis=0)))
        hist5 = np.minimum(hist4, batch_sigs(b1).min(axis=0))
        one_sig = batch_sigs([b1[0]]).min(axis=0)
        assert r7.est_containment == cont(one_sig, hist5)
        # and the semantics: rewording stays similar, rotation doesn't
        # (the reworded batch covers 2 of 3 history docs, so its true
        # union-Jaccard sits near 0.5 — the gap to the rotation's ~0
        # is the signal, not the absolute level); containment is
        # always >= jaccard (b <= 1 in the ratio)
        assert r3.est_jaccard >= 0.4
        assert r3.est_containment >= r3.est_jaccard
        assert r4.est_jaccard < 0.2 and r4.novelty > 0.8
        # the advice scenario: one replayed doc vs a 7-doc history —
        # B ⊆ H makes merged == history, so numerator == denominator
        # and containment is EXACTLY 1.0 (while jaccard has shrunk)
        assert r7.n_batch == 1
        assert r7.est_jaccard < 0.6
        assert r7.est_containment == 1.0 and r7.novelty == 0.0
    finally:
        q.stop()


def test_minhash_drift_snapshot_seed_roundtrip(db, spark):
    """GC + seed round-trip for the similarity monitor: the idle GC
    emits the history signature as a marker row (scores NULL,
    sig_shingle_k recorded); feeding markers back as ``seed``
    restores it across a restart (replay scores est_jaccard 1.0,
    n_total continues). Seed validation is exact: wrong num_hashes
    (signature length) and wrong shingle_k both raise."""
    import numpy as np

    from ella_spark.streaming.stateful import minhash_drift_per_group

    topic = db.create_topic(
        "mhds",
        [Column("g", "string", required=True), Column("txt", "string")],
    )
    ns = 1_000_000_000
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",
    ]
    with topic.publish() as pub:
        for i, t in enumerate(texts):
            pub.write((i + 1) * ns, "g1", t)
    out = minhash_drift_per_group(
        db.subscribe("mhds"),
        "g",
        "txt",
        shingle_k=8,
        num_hashes=32,
        idle_timeout_ms=500,
        snapshot_on_timeout=True,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mhds_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "mhds_out"),
        )
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if (
                spark.sql("SELECT count(*) FROM mhds_out").collect()[0][0]
                >= n
            ):
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_rows(1), "first batch never scored"
        assert wait_rows(2), "snapshot marker never emitted"
    finally:
        q.stop()
    pdf = spark.sql("SELECT * FROM mhds_out").toPandas()
    snaps = pdf[pdf.snapshot.notna()]
    scores = pdf[pdf.snapshot.isna()]
    assert len(snaps) >= 1 and len(scores) >= 1
    snap = snaps.iloc[-1]
    assert snap.n_batch == 0 and snap.sig_shingle_k == 8
    assert len(list(snap.snapshot)) == 32
    assert pd.isna(snap.est_jaccard) and pd.isna(snap.novelty)
    assert pd.isna(snap.est_containment)
    assert all(pd.isna(s) for s in scores.sig_shingle_k)
    seed_n = int(snap.n_total)

    # restart, seeded: replaying the SAME docs is a pure re-crawl
    seed = spark.sql(
        "SELECT group, snapshot, n_total, sig_shingle_k FROM mhds_out "
        "WHERE snapshot IS NOT NULL"
    )
    with topic.publish() as pub:
        for i, t in enumerate(texts):
            pub.write((100 + i) * ns, "g1", t)
    out2 = minhash_drift_per_group(
        db.subscribe("mhds"),
        "g",
        "txt",
        shingle_k=8,
        num_hashes=32,
        seed=seed,
    )
    q2 = (
        out2.writeStream.format("memory")
        .queryName("mhds_out2")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "mhds_out2"),
        )
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    pdf2 = spark.sql("SELECT * FROM mhds_out2 ORDER BY n_total").toPandas()
    last = pdf2.iloc[-1]
    assert last.est_jaccard == 1.0 and last.novelty == 0.0
    assert last.est_containment == 1.0
    assert last.n_total == seed_n + int(pdf2.n_batch.sum())

    # exact validation: wrong num_hashes = wrong signature LENGTH
    with pytest.raises(ValueError, match="num_hashes=64"):
        minhash_drift_per_group(None, "g", "txt", num_hashes=64, seed=seed)
    # wrong shingle width: different gram space, rejected loudly
    with pytest.raises(ValueError, match="shingle_k=4"):
        minhash_drift_per_group(
            None, "g", "txt", shingle_k=4, num_hashes=32, seed=seed
        )


def test_minhash_drift_batch_tvf_matches_streaming_fold(db, spark):
    """The r14 batch twin pin (VERDICT r13 #3): when micro-batches
    align with day buckets, the minhash_drift TVF's per-bucket scores
    are VALUE-IDENTICAL to the streaming monitor's per-batch scores —
    same signature chain, same accumulated-history fold (slotwise
    unsigned min), same agreement/containment arithmetic, one
    computed in numpy inside applyInPandasWithState, the other in
    JVM column expressions over the sign-bit-flipped domain."""
    from ella_spark.streaming.stateful import minhash_drift_per_group

    day = 86_400_000_000_000
    buckets = [
        [
            "the quick brown fox jumps over the lazy dog near the river",
            "a second document about spark structured streaming state",
        ],
        [
            "the quick brown fox jumps over the lazy dog near the creek",
        ],
        [
            "zzz completely rotated corpus qqq unrelated ngrams xxyyzz",
            "vvv nothing shared with history wwww kkkjjj hhhhgg ffff",
        ],
        ["cbebhhhgd"],  # one-shingle doc: negative-as-int64 slots
        [
            "the quick brown fox jumps over the lazy dog near the river",
        ],
    ]
    topic = db.create_topic(
        "mhd_tvf",
        [Column("src", "string", required=True), Column("body", "string")],
    )
    out = minhash_drift_per_group(
        db.subscribe("mhd_tvf"), "src", "body", shingle_k=8, num_hashes=64
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mhd_tvf_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "mhd_tvf_out"),
        )
        .start()
    )
    try:
        for d, docs in enumerate(buckets):
            with topic.publish() as pub:
                for i, b in enumerate(docs):
                    pub.write(d * day + i, "feed", b)
            q.processAllAvailable()
    finally:
        q.stop()
    stream_rows = spark.sql(
        "SELECT * FROM mhd_tvf_out ORDER BY n_total"
    ).collect()
    batch_rows = db.query(
        "SELECT * FROM minhash_drift('mhd_tvf', 'src', 'body') "
        "ORDER BY bucket_start"
    ).df.collect()
    assert len(batch_rows) == len(buckets)
    # one micro-batch per publish (the cadence every monitor pin in
    # this file relies on: each push is followed by its own
    # processAllAvailable)
    assert len(stream_rows) == len(buckets)
    for s, b in zip(stream_rows, batch_rows):
        assert s.n_batch == b.n_docs
        assert (s.est_jaccard, s.est_containment, s.novelty) == (
            b.est_jaccard,
            b.est_containment,
            b.novelty,
        ), b.bucket_start
