"""Misra-Gries heavy-hitters: exactness and error-bound properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from ella_spark.operators.sketch import _mg_update, heavy_hitters


def test_exact_when_vocab_fits(spark):
    """No eviction ever fires when distinct keys ≤ counters, so the
    result equals the exact top-k."""
    rows = [(w,) for w in
            ["a"] * 50 + ["b"] * 30 + ["c"] * 19 + ["d"] * 1]
    df = spark.createDataFrame(rows, "w string").repartition(4)
    got = {
        (r.value, r.approx_count, r.rank)
        for r in heavy_hitters(df, "w", k=3, counters=16).collect()
    }
    assert got == {("a", 50, 1), ("b", 30, 2), ("c", 19, 3)}


def test_heavy_key_survives_eviction(spark):
    """A key with true count > n/(counters+1) must appear even when the
    key space overflows the counters (the MG guarantee)."""
    # 1000 rows of a heavy key + 2000 distinct singletons, 8 counters
    rows = [("HOT",)] * 1000 + [(f"u{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "w string").repartition(4)
    out = heavy_hitters(df, "w", k=1, counters=8).collect()
    assert out[0].value == "HOT"
    # undercount is bounded by n_total/(counters+1)
    assert out[0].approx_count >= 1000 - 3000 // 9
    assert out[0].approx_count <= 1000


def test_mg_update_bounds_summary_size():
    s: dict = {}
    for start in range(0, 10_000, 100):
        _mg_update(s, {f"k{i}": 1 for i in range(start, start + 100)}, 32)
        assert len(s) <= 32


def test_summary_shuffle_is_bounded(spark):
    """The exchange input is summary rows (≤ counters x tasks), never
    the raw value stream."""
    df = spark.range(100_000).select(
        (F.col("id") % 50_000).cast("string").alias("w")
    )
    plan = (
        heavy_hitters(df, "w", k=5, counters=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the map-side summarize must sit below the first exchange
    assert plan.index("MapInPandas") > plan.index("Exchange hashpartitioning")


def test_distinct_rollup_merges_exactly_like_global(spark):
    """Union of per-day sketches must estimate the same as one sketch
    over all data (mergeability), and be within HLL error of exact."""
    import pyspark.sql.functions as F

    from ella_spark.operators.sketch import distinct_rollup, merge_distinct

    df = spark.range(50_000).select(
        (F.col("id") % 9973).alias("user"), (F.col("id") % 14).alias("day")
    )
    roll = distinct_rollup(df, "user", "day")
    assert roll.count() == 14
    merged = merge_distinct(roll).collect()[0].distinct_estimate
    direct = (
        df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user", F.lit(12))))
        .collect()[0][0]
    )
    assert merged == direct  # same sketch algebra -> identical estimate
    assert abs(merged - 9973) / 9973 < 0.05

    # range query: merge a subset of buckets without touching raw rows
    week = merge_distinct(roll.where(F.col("bucket") < 7)).collect()[0][0]
    exact_week = df.where(F.col("day") < 7).select("user").distinct().count()
    assert abs(week - exact_week) / exact_week < 0.05
