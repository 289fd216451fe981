"""M4 downsampling emission semantics (r14).

q_m4_downsample moved from four row_number windows (full-row shuffle
+ quadruple per-bucket sort; WindowGroupLimit structurally blocked by
the 4-ordering combination) to min_by/max_by declarative aggregates
(map-side partials; the exchange carries four point structs per
bucket per mapper). The aggregate form must keep the window form's
emission semantics EXACTLY:

- one physical row winning several criteria is emitted ONCE;
- two DISTINCT events that project to the same (ts_us, value) are
  emitted as TWO rows (event_id disambiguates inside the point
  struct — dropping it would silently merge them);
- all four tie-breaks ((time, id) for first/last; (value, time, id)
  for min; value DESC then (time, id) ASC for max) match the window
  orderings bit-for-bit.

The sf corpora barely exercise these collisions (one duplicate
(user, bucket, value) triple at sf0.01), so this file pins them on a
hand-built collision frame and on a randomized heavy-tie corpus
compared row-for-row against the original four-window form.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
from pyspark.sql import Window

from tests.conftest import REPO  # noqa: F401  (sys.path side effect)


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, t, u, e, v, None) for (i, t, u, e, v) in rows],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _m4(spark, sf_dir):
    from ella_spark.queries import REGISTRY, _load

    _load()
    return [
        (r.user_id, r.bkt, r.ts_us, r.v)
        for r in REGISTRY["q_m4_downsample"].spark(spark, sf_dir).collect()
    ]


def _m4_window_form(spark, sf_dir):
    """The original four-row_number reference implementation, with the
    same NULL-value exclusion the query (and its oracle) adopted in
    r14 — un-measured points must not win an extremal slot."""
    from ella_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    b = ev.select(
        "user_id",
        F.expr("ts div 86400000000000").alias("bkt"),
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        "value",
    )
    part = ["user_id", "bkt"]
    wf = Window.partitionBy(*part).orderBy("ts_us", "event_id")
    wl = Window.partitionBy(*part).orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    wmin = Window.partitionBy(*part).orderBy("value", "ts_us", "event_id")
    wmax = Window.partitionBy(*part).orderBy(
        F.col("value").desc(), "ts_us", "event_id"
    )
    r = (
        b.withColumn("rf", F.row_number().over(wf))
        .withColumn("rl", F.row_number().over(wl))
        .withColumn("rmin", F.row_number().over(wmin))
        .withColumn("rmax", F.row_number().over(wmax))
    )
    out = (
        r.where(
            (F.col("rf") == 1)
            | (F.col("rl") == 1)
            | (F.col("rmin") == 1)
            | (F.col("rmax") == 1)
        )
        .select("user_id", "bkt", "ts_us", F.round("value", 6).alias("v"))
        .orderBy("user_id", "bkt", "ts_us", "v")
    )
    return [(r.user_id, r.bkt, r.ts_us, r.v) for r in out.collect()]


def test_m4_duplicate_projection_and_single_winner(spark, tmp_path):
    t0 = datetime(1970, 1, 1)
    us = timedelta(microseconds=1)
    rows = [
        # user 1: A and B are distinct events with IDENTICAL
        # (ts_us, value); A wins first/min/max (id tie-break), B wins
        # last (ts DESC, id DESC) -> TWO identical output rows
        (1, t0 + 100 * us, 1, "x", 5.0),
        (2, t0 + 100 * us, 1, "x", 5.0),
        # user 2: one event wins all four criteria -> ONE output row
        (3, t0 + 500 * us, 2, "x", 7.0),
        # user 3: four distinct winners -> four rows
        (10, t0 + 1000 * us, 3, "x", 1.0),
        (11, t0 + 2000 * us, 3, "x", 3.0),
        (12, t0 + 3000 * us, 3, "x", -2.0),
        (13, t0 + 4000 * us, 3, "x", 0.5),
    ]
    sf = _write_events(spark, tmp_path, rows)
    assert _m4(spark, sf) == [
        (1, 0, 100, 5.0),
        (1, 0, 100, 5.0),
        (2, 0, 500, 7.0),
        (3, 0, 1000, 1.0),
        (3, 0, 2000, 3.0),
        (3, 0, 3000, -2.0),
        (3, 0, 4000, 0.5),
    ]


def test_m4_matches_window_form_on_heavy_ties(spark, tmp_path):
    """Row-for-row identity with the four-window reference on a
    corpus drawn from 2 values x 3 timestamps x 4 users x 2 buckets —
    ties on every ordering prefix, so every tie-break path runs. The
    value pool also includes NULL and NaN: min_by/max_by struct-field
    ordering must agree with the window sorts' null/NaN placement
    (ASC nulls-first / DESC nulls-last; NaN greatest) or the picked
    rows silently diverge."""
    import math
    import random

    rng = random.Random(1405)
    t0 = datetime(1970, 1, 1)
    day = timedelta(days=1)
    us = timedelta(microseconds=1)
    rows = [
        (
            eid,
            t0 + rng.randrange(2) * day + rng.choice([100, 200, 300]) * us,
            rng.randrange(4),
            "x",
            rng.choice([1.5, 2.5, None, float("nan")]),
        )
        for eid in range(200)
    ]
    sf = _write_events(spark, tmp_path, rows)

    def _key(row):
        # NaN != NaN (and None is unsortable against floats): compare
        # on a normalized string form of the value
        u, b, ts, v = row
        vn = "null" if v is None else ("nan" if math.isnan(v) else repr(v))
        return (u, b, ts, vn)

    got = sorted(map(_key, _m4(spark, sf)))
    exp = sorted(map(_key, _m4_window_form(spark, sf)))
    assert got == exp
