"""Exact-offset topic stream source (sources/topic_stream.py).

Verifies the three properties the built-in file source cannot give:
shard-log offsets, no re-delivery of compacted shards to caught-up
subscribers, and a true `latest` starting position (the reference's
subscribe(): only rows published after the call, channel.rs:250-331).
"""

from __future__ import annotations

import uuid

import pytest

from ella_spark import Column, Ella, compact_topic


@pytest.fixture()
def db(spark, tmp_path):
    return Ella.create(str(tmp_path / "db"), spark)


def _drain(q):
    q.processAllAvailable()


def _rows(spark, name):
    return [
        (r["time"], r["v"])
        for r in spark.sql(f"SELECT * FROM {name} ORDER BY time").collect()
    ]


def _start(topic, spark, tmp_path, starting="earliest"):
    name = f"exact_{uuid.uuid4().hex[:8]}"
    q = (
        topic.read_stream_exact(spark, starting=starting)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    return q, name


def test_history_then_live_exact(db, spark, tmp_path):
    t = db.create_topic("ex1", [Column("v", "int64")])
    with t.publish() as pub:
        pub.write(1_000, 1)
        pub.write(2_000, 2)

    q, name = _start(t, spark, tmp_path)
    try:
        _drain(q)
        assert _rows(spark, name) == [(1_000, 1), (2_000, 2)]

        with t.publish() as pub:
            pub.write(3_000, 3)
        _drain(q)
        assert _rows(spark, name) == [(1_000, 1), (2_000, 2), (3_000, 3)]
    finally:
        q.stop()


def test_compaction_not_redelivered(db, spark, tmp_path):
    t = db.create_topic("ex2", [Column("v", "int64")])
    for i in range(4):  # four separate publishers → four shards
        with t.publish() as pub:
            pub.write((i + 1) * 1_000, i)
    assert len(t.shards()) == 4

    q, name = _start(t, spark, tmp_path)
    try:
        _drain(q)
        assert len(_rows(spark, name)) == 4

        merged = compact_topic(t, target_rows=1_000_000, min_shards=2)
        assert merged is not None and len(t.shards()) == 1

        with t.publish() as pub:
            pub.write(9_000, 99)
        _drain(q)
        got = _rows(spark, name)
        # 4 original + 1 new — the merged shard was NOT re-delivered
        assert got == [(1_000, 0), (2_000, 1), (3_000, 2), (4_000, 3), (9_000, 99)]
    finally:
        q.stop()


def test_starting_latest_skips_history(db, spark, tmp_path):
    t = db.create_topic("ex3", [Column("v", "int64")])
    with t.publish() as pub:
        pub.write(1_000, 1)

    q, name = _start(t, spark, tmp_path, starting="latest")
    try:
        _drain(q)
        assert _rows(spark, name) == []

        with t.publish() as pub:
            pub.write(2_000, 2)
        _drain(q)
        assert _rows(spark, name) == [(2_000, 2)]
    finally:
        q.stop()
