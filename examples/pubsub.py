#!/usr/bin/env python
"""Pub/sub quickstart — the ella_spark mirror of the reference's
pubsub example (ella-engine/examples/pubsub.rs:43-82, minus the
OpenTelemetry plumbing): create a database, declare a topic with a
tensor-valued column, publish rows for a couple of seconds from a
background thread, and run a unified scan that yields HISTORY first,
then LIVE rows, terminating when the last publisher closes.

    python examples/pubsub.py [root-dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import tempfile
import threading
import time

from ella_spark import Column, Ella


def main(root: str | None = None) -> int:
    root = root or tempfile.mkdtemp(prefix="ella_pubsub_")
    db = Ella.create(f"{root}/db")

    # reference columns: scalar int, duration, fixed-shape tensors
    topic = db.create_topic(
        "point",
        [
            Column("i", "int32"),
            Column("dt", "duration"),
            Column("x", "float32", row_shape=(4,)),
        ],
    )

    # history tier: rows that exist before the subscriber starts
    with topic.publish() as pub:
        for i in range(3):
            pub.write(i * 1_000_000, i, 1_000, [float(i)] * 4)

    from ella_spark.streaming import TrackedPublisher

    live = TrackedPublisher(topic)

    def publish_live() -> None:
        t_end = time.time() + 2.0
        i = 100
        while time.time() < t_end:
            live.write(time.time_ns(), i, 1_000, [float(i)] * 4)
            live.flush()
            i += 1
            time.sleep(0.25)
        live.close()  # -> the scan's stop-on-inactive fires

    t = threading.Thread(target=publish_live)
    t.start()
    n_hist = 0
    n_live = 0
    for row in db.scan("point", mode="auto", timeout_sec=60):
        if row.i < 100:
            n_hist += 1
        else:
            n_live += 1
    t.join()
    print(f"history rows: {n_hist}  live rows: {n_live}")
    assert n_hist == 3 and n_live >= 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
