#!/usr/bin/env python
"""Drift dashboard from plain SQL — beyond the reference's surface:
ingest two regimes into a topic, then score location / dispersion /
transport / changepoint drift with the table-valued functions, all
from SQL, and persist a VIEW whose durable text re-scores CURRENT
data on every read (the saved-dashboard contract).

    python examples/drift_dashboard.py [root-dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ella_spark import Column, Ella


def main(root: str | None = None) -> int:
    root = root or tempfile.mkdtemp(prefix="ella_drift_")
    db = Ella.create(f"{root}/db")
    t = db.create_topic(
        "metrics",
        [Column("sensor", "string", required=True), Column("v", "float64")],
    )

    ns = 1_000_000_000
    day = 86_400 * ns
    with t.publish() as pub:
        for d in range(20):
            for i in range(5):
                # sensor a: steady around 10; sensor b: level-shifts
                # +30 at day 10 and gets noisier
                pub.write(d * day + i * ns, "a", 10.0 + (i % 3))
                base = 10.0 if d < 10 else 40.0
                spread = 1.0 if d < 10 else 6.0
                pub.write(d * day + i * ns, "b", base + spread * (i % 3))

    def show(title, sql):
        print(f"\n-- {title}\n   {sql}")
        for row in db.query(sql).df.collect():
            print("  ", row.asDict())

    show("PSI vs pooled", "SELECT * FROM psi_drift('metrics', 'v', 'sensor') ORDER BY sensor")
    show("KS vs pooled", "SELECT * FROM ks_drift('metrics', 'v', 'sensor') ORDER BY sensor")
    show("earth-mover (value units)",
         "SELECT * FROM earth_movers('metrics', 'v', 'sensor') ORDER BY sensor")
    show("CUSUM changepoint (day bucket)",
         "SELECT * FROM cusum_drift('metrics', 'v', 'sensor') ORDER BY sensor")
    show("Page-Hinkley mean-shift alarm",
         "SELECT * FROM page_hinkley('metrics', 'v', 'sensor') ORDER BY sensor")
    show("Mann-Whitney AUC vs rest",
         "SELECT * FROM mann_whitney('metrics', 'v', 'sensor') ORDER BY sensor")
    show("Levene dispersion homogeneity",
         "SELECT * FROM levene('metrics', 'v', 'sensor')")

    show("day-over-day set churn (novelty per sensor)",
         "SELECT * FROM set_churn('metrics', 'sensor', 'v') "
         "WHERE novelty > 0.9 ORDER BY group, bucket_start LIMIT 5")

    # sanity: only the shifted sensor alarms (so far)
    ph = {r.sensor: r.alarm_up for r in db.query(
        "SELECT * FROM page_hinkley('metrics', 'v', 'sensor')").df.collect()}
    assert ph["b"] and not ph["a"]
    # the level shift at day 10 rotates sensor b's VALUE SET — churn
    # novelty catches it as a full-rotation day
    churn = {(r.group, r.bucket_start // day): r.novelty for r in db.query(
        "SELECT * FROM set_churn('metrics', 'sensor', 'v')").df.collect()}
    assert churn[("b", 10)] == 1.0 and churn[("a", 10)] == 0.0

    # the saved-dashboard contract: a stored view keeps the durable
    # TVF text and re-scores CURRENT data at every read
    db.query(
        "CREATE VIEW drift_board AS "
        "SELECT * FROM ks_drift('metrics', 'v', 'sensor')"
    )
    before = {r.sensor: r.d_stat for r in db.query("SELECT * FROM drift_board").df.collect()}
    with t.publish() as pub:  # new data arrives...
        for i in range(50):
            pub.write(30 * day + i * ns, "a", 500.0 + i)
    after = {r.sensor: r.d_stat for r in db.query("SELECT * FROM drift_board").df.collect()}
    print(f"\nstored view re-scored: a {before['a']} -> {after['a']}")
    assert after["a"] != before["a"]  # the view scored CURRENT data

    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
