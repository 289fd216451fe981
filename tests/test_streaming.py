"""Streaming-tier tests: live subscription, stop-on-inactive, windows."""

from __future__ import annotations

import time

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
