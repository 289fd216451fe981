#!/usr/bin/env python
"""Crawler ingest monitoring end-to-end: a streaming distinct-count /
duplicate-rate monitor over a topic, with bounded per-group state,
idle-state GC that SNAPSHOTS each evicted sketch instead of erasing
it, and a restart that resumes history from those snapshots — so a
re-crawl scores dup_rate = 1.0 even across a GC + new query.

    python examples/ingest_monitor.py [root-dir]

The monitor is `cardinality_drift_per_group` (streaming/stateful.py):
per group a KMV bottom-k sketch — O(k) state forever, exact below k
distinct values, value-identical to the batch kmv_sketch operator on
the concatenated history.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ella_spark import Column, Ella
from ella_spark.streaming.stateful import cardinality_drift_per_group


def _wait_rows(spark, view: str, n: int, timeout_s: float = 90) -> bool:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if spark.sql(f"SELECT count(*) FROM {view}").collect()[0][0] >= n:
            return True
        time.sleep(0.25)
    return False


def main(root: str | None = None) -> int:
    root = root or tempfile.mkdtemp(prefix="ella_ingest_")
    db = Ella.create(f"{root}/db")
    spark = db.spark
    t = db.create_topic(
        "pages",
        [Column("source", "string", required=True), Column("url", "string")],
    )

    ns = 1_000_000_000
    urls = [f"https://example.com/{i}" for i in range(4)]
    with t.publish() as pub:
        for i, u in enumerate(urls):
            pub.write((i + 1) * ns, "crawl", u)

    # ── run 1: monitor with idle-state GC + snapshot-on-timeout ────
    mon = cardinality_drift_per_group(
        db.subscribe("pages"),
        "source",
        "url",
        k=64,
        idle_timeout_ms=400,
        snapshot_on_timeout=True,
    )
    q = (
        mon.writeStream.format("memory")
        .queryName("ingest_mon_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "ingest_mon_out"),
        )
        .start()
    )
    try:
        assert _wait_rows(spark, "ingest_mon_out", 1), "no score row"
        # go idle past the timeout: the GC emits the sketch as a row
        assert _wait_rows(spark, "ingest_mon_out", 2), "no snapshot row"
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT * FROM ingest_mon_out ORDER BY n_batch DESC"
    ).collect()
    print("\n-- run 1 (fresh crawl, then idle-GC snapshot)")
    for r in rows:
        print("  ", {k: v for k, v in r.asDict().items() if k != "snapshot"},
              "snapshot:", "yes" if r.snapshot is not None else None)
    # batching-robust assertions (r13 advice): the source may split
    # the 4 initial rows across micro-batches, so select the marker
    # row by its snapshot column and AGGREGATE the score rows instead
    # of indexing rows[0]/rows[-1] positionally
    scores = [r for r in rows if r.snapshot is None]
    snaps = [r for r in rows if r.snapshot is not None]
    assert snaps, "no snapshot marker row"
    assert all(s.n_batch == 0 for s in snaps)
    # across however many batches: all 4 urls distinct, none repeated
    assert max(s.n_total for s in scores) == 4
    assert sum(s.est_new for s in scores) == 4.0
    assert all(s.dup_rate == 0.0 for s in scores)

    # ── run 2: restart, seeded from the persisted snapshots ────────
    seed = spark.sql(
        # sketch_k rides along so the monitor validates k EXACTLY
        "SELECT group, snapshot, n_total, sketch_k FROM ingest_mon_out "
        "WHERE snapshot IS NOT NULL"
    )
    with t.publish() as pub:  # the crawler re-fetches the same pages
        for i, u in enumerate(urls):
            pub.write((100 + i) * ns, "crawl", u)
    mon2 = cardinality_drift_per_group(
        db.subscribe("pages"), "source", "url", k=64, seed=seed
    )
    q2 = (
        mon2.writeStream.format("memory")
        .queryName("ingest_mon_out2")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "ingest_mon_out2"),
        )
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows2 = spark.sql(
        "SELECT * FROM ingest_mon_out2 ORDER BY n_total"
    ).collect()
    print("\n-- run 2 (re-crawl after restart, history restored)")
    for r in rows2:
        print("  ", r.asDict())
    last = rows2[-1]
    # nothing is new: the seed restored the 4-url history, so the
    # re-crawl (and the fresh checkpoint's replay) is all duplicates
    assert last.est_distinct == 4.0
    assert last.est_new == 0.0 and last.dup_rate == 1.0
    print("\nre-crawl correctly scored as 100% duplicates across restart")

    # ── WHICH values, not just how many: the set-churn sibling ─────
    # a rotated feed ships the same NUMBER of urls but a disjoint SET
    from ella_spark.streaming.stateful import set_churn_per_group

    with t.publish() as pub:
        for i in range(4):
            pub.write((200 + i) * ns, "crawl", f"https://other.net/{i}")
    mon3 = set_churn_per_group(db.subscribe("pages"), "source", "url", k=64)
    q3 = (
        mon3.writeStream.format("memory")
        .queryName("ingest_churn_out")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "ingest_churn_out"),
        )
        .start()
    )
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    churn = spark.sql(
        "SELECT * FROM ingest_churn_out ORDER BY n_total"
    ).collect()
    print("\n-- set churn (fresh query over the full topic history)")
    for r in churn:
        print("  ", r.asDict())
    # after the last batch the union covers the whole topic history:
    # 4 distinct example.com urls (published twice) + 4 rotated urls
    assert churn[-1].est_union == 8.0
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
