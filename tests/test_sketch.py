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


def test_kll_exact_when_fits():
    """n <= k: no compaction, the sketch IS the sorted data and every
    quantile equals the discrete rank-ceil(p*n) exact answer — the
    contract the registry oracle relies on."""
    import math

    import numpy as np

    from ella_spark.operators.sketch import kll_build, kll_quantiles

    rng = np.random.default_rng(7)
    v = rng.normal(100, 25, size=900)
    sk = kll_build(v, k=1024)
    assert sum(len(l) for l in sk) == 900  # untouched
    s = np.sort(v)
    for p in (0.1, 0.5, 0.9, 0.99, 1.0):
        exact = s[max(1, math.ceil(p * len(s))) - 1]
        assert kll_quantiles(sk, [p])[0] == exact, p


def test_kll_error_bound_and_merge():
    """Compacted sketches (n >> k) keep rank error well under the
    KLL budget, merging part-sketches matches building one sketch's
    error class, and construction is deterministic (derandomized
    compaction coin): same multiset -> same sketch."""
    import numpy as np

    from ella_spark.operators.sketch import kll_build, kll_merge, kll_quantiles

    rng = np.random.default_rng(11)
    # mixed distribution: uniform body + lognormal tail
    v = np.concatenate(
        [rng.uniform(0, 1000, 40_000), rng.lognormal(6, 1, 10_000)]
    )
    n, k = len(v), 256
    s = np.sort(v)

    def rank_err(est, p):
        true_rank = p * n
        got_rank = np.searchsorted(s, est, side="right")
        return abs(got_rank - true_rank) / n

    whole = kll_build(v, k)
    assert sum(len(l) for l in whole) < 6 * k  # bounded summary
    for p in (0.1, 0.5, 0.9, 0.99):
        assert rank_err(kll_quantiles(whole, [p])[0], p) < 0.03, p

    # merge of 5 shards: same error class as the single build
    parts = np.array_split(v, 5)
    merged: list = []
    for part in parts:
        merged = kll_merge(merged, kll_build(part, k), k)
    for p in (0.1, 0.5, 0.9, 0.99):
        assert rank_err(kll_quantiles(merged, [p])[0], p) < 0.04, p

    # determinism: rebuild -> identical level contents
    again = kll_build(v, k)
    assert len(again) == len(whole)
    for a, b in zip(again, whole):
        assert np.array_equal(a, b)


def test_quantile_rollup_range_merge(spark):
    """Per-bucket sketches answer any range without raw rescans: the
    merged week estimate equals the exact discrete quantile when
    buckets fit uncompacted (k above the merged range's total, so
    no compaction fires during the merge either), and sketch rows are
    all a range query reads."""
    import math

    import numpy as np

    from ella_spark.operators.sketch import (
        merge_quantile_rollup,
        quantile_rollup,
    )

    df = spark.range(14_000).select(
        (F.col("id") % 14).alias("day"),
        (F.hash("id") % 1000).cast("double").alias("v"),
    )
    roll = quantile_rollup(df, "v", "day", k=8192)
    assert roll.count() == 14
    week = roll.where(F.col("bucket") < 7)
    got = merge_quantile_rollup(week, [0.5, 0.99], k=8192)
    exact = np.sort(
        np.array(
            df.where(F.col("day") < 7).select("v").toPandas()["v"], dtype=float
        )
    )
    for p, est in zip([0.5, 0.99], got):
        assert est == exact[max(1, math.ceil(p * len(exact))) - 1], p


def test_kmv_exact_regime_matches_truth(spark):
    """When every group's distinct count fits in k, the sketch holds
    the full set: per-group estimates, union, Jaccard, and
    intersection are all exact."""
    from ella_spark.operators.sketch import kmv_overlap

    # A = {0..999}, B = {600..1599}: |A|=|B|=1000, inter=400, union=1600
    df = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        F.when(F.col("id") < 1000, F.col("id"))
        .otherwise(F.col("id") - 400)
        .alias("v"),
    )
    row = kmv_overlap(df, "g", "v", k=4096).collect()[0]
    assert (row.grp_a, row.grp_b) == ("a", "b")
    assert row.est_a == 1000.0 and row.est_b == 1000.0
    assert row.union_est == 1600.0
    assert row.jaccard == 400.0 / 1600.0
    assert row.inter_est == (400.0 / 1600.0) * 1600.0


def test_kmv_approx_regime_error_bounds(spark):
    """Approximate regime (distinct >> k): relative error of the
    (k-1)/h_(k) estimator has sd ~ 1/sqrt(k-2) (Beyer et al.
    SIGMOD'07) — assert within 5 sd. Deterministic: xxhash64 is a
    fixed function, so this pins one concrete draw, not a flake."""
    from ella_spark.operators.sketch import kmv_overlap

    k = 512
    # A = {0..19999}, B = {10000..29999}: inter=10000, union=30000
    a = spark.range(0, 20_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(10_000, 30_000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    row = kmv_overlap(a.unionAll(b), "g", "v", k=k).collect()[0]
    sd = 1.0 / (k - 2) ** 0.5
    assert abs(row.est_a - 20_000) / 20_000 < 5 * sd
    assert abs(row.est_b - 20_000) / 20_000 < 5 * sd
    assert abs(row.union_est - 30_000) / 30_000 < 5 * sd
    assert abs(row.jaccard - 1 / 3) < 0.1
    assert abs(row.inter_est - 10_000) / 10_000 < 0.25


def test_kll_split_invariance_exact_regime():
    """The streaming fold (winsorize_per_group / quantiles_per_group)
    merges per-batch level-0 runs into the carried sketch: in the
    exact regime (total n <= k) the resulting quantiles must be
    IDENTICAL for every way of splitting the same values into
    micro-batches — hypothesis drives the split points."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ella_spark.operators.sketch import (
        _kll_compact,
        kll_build,
        kll_quantiles,
    )

    def fold(batches, k=256):
        levels, parity = [], 0
        for vals in batches:
            pstate = {"c": parity}
            batch_lvl = [np.sort(np.asarray(vals, dtype=np.float64))]
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
        return levels

    @settings(max_examples=30, deadline=None)
    @given(
        vals=st.lists(
            st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=120
        ),
        data=st.data(),
    )
    def check(vals, data):
        n = len(vals)
        n_cuts = data.draw(st.integers(0, min(4, n - 1)))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(1, n - 1),
                    min_size=n_cuts,
                    max_size=n_cuts,
                    unique=True,
                )
            )
        ) if n > 1 else []
        bounds = [0] + cuts + [n]
        batches = [vals[a:b] for a, b in zip(bounds, bounds[1:])]
        probs = [0.05, 0.5, 0.95]
        got = kll_quantiles(fold(batches), probs)
        want = kll_quantiles(kll_build(vals), probs)
        assert got == want  # n <= 120 << k: both are the sorted data

    check()


def test_quantile_rollup_approx_regime_bound(spark):
    """The registry query's regime-aware NULL gate, exercised end to
    end at small k so compaction actually fires: (1) rows whose n
    exceeds the level-0 cap get NULL quantiles on the Spark side —
    mirroring the oracle's CASE WHEN n <= k gate — and (2) the
    suppressed estimates themselves (un-gated) stay inside the KLL
    rank-error budget, so the NULL is a presentation choice, not a
    correctness escape hatch."""
    import math

    import numpy as np

    from ella_spark.operators.sketch import (
        kll_merge,
        kll_quantiles,
        quantile_rollup,
    )

    k = 256
    n = 30_000
    df = spark.range(n).select(
        (F.col("id") % 10).alias("day"),
        (F.hash("id") % 100_000).cast("double").alias("v"),
    )
    roll = quantile_rollup(df, "v", "day", k=k).collect()
    # every day bucket holds 3000 > k rows: the approximate regime
    merged: list = []
    total = 0
    for r in roll:
        assert r.n == n // 10 and r.n > k
        merged = kll_merge(merged, [list(l) for l in r.levels], k)
        total += int(r.n)
    assert total == n

    vals = np.sort(
        np.array(df.select("v").toPandas()["v"], dtype=np.float64)
    )
    probs = (0.5, 0.9, 0.99)
    ests = kll_quantiles(merged, probs)
    for p, est in zip(probs, ests):
        got_rank = np.searchsorted(vals, est, side="right")
        assert abs(got_rank - p * n) / n < 0.03, p

    # and the registry query itself applies the gate symmetrically:
    # at this SF everything fits (n <= 16384), so no row is NULLed
    # and each value equals the exact discrete quantile
    from ella_spark.queries.timeseries import _QR_K, q_quantile_rollup
    from tests.conftest import SF_SMOKE

    out = q_quantile_rollup(spark, SF_SMOKE).collect()
    assert out, "rollup produced no rows"
    for row in out:
        if row.n <= _QR_K:
            assert row.p50 is not None and row.p99 is not None
        else:
            assert row.p50 is None and row.p90 is None and row.p99 is None


def test_set_churn_buckets_exact_day_over_day(spark):
    """Bucket-over-bucket set churn, exact arithmetic on a planted
    timeline: fresh day (novelty 1), half-rotated day (novelty .5,
    jaccard 1/3), re-served day (novelty 0, jaccard 1), and a day
    AFTER A GAP scores against an empty previous set (novelty 1) —
    bucket adjacency, not ever-seen history."""
    from ella_spark.operators.sketch import set_churn_buckets

    day = 86_400_000_000_000
    rows = []
    for t, vals in [
        (0, ["a", "b", "c", "d"]),
        (1, ["c", "d", "e", "f"]),
        (2, ["c", "d", "e", "f"]),
        (4, ["x"]),  # day 3 is a gap
    ]:
        rows += [("s1", t * day + i, v) for i, v in enumerate(vals)]
    rows += [("s2", 0, "a")]
    df = spark.createDataFrame(rows, "src string, ts long, v string")

    out = {
        (r.group, r.bucket_start // day): r
        for r in set_churn_buckets(df, "src", "v", time_col="ts").collect()
    }
    assert len(out) == 5
    d0, d1, d2, d4 = (out[("s1", i)] for i in (0, 1, 2, 4))
    assert (d0.cur_distinct, d0.prev_distinct, d0.inter) == (4, 0, 0)
    assert d0.jaccard == 0.0 and d0.novelty == 1.0
    assert (d1.cur_distinct, d1.prev_distinct, d1.inter, d1.uni) == (4, 4, 2, 6)
    assert d1.jaccard == 0.333333 and d1.novelty == 0.5
    assert (d2.inter, d2.uni) == (4, 4)
    assert d2.jaccard == 1.0 and d2.novelty == 0.0
    assert (d4.cur_distinct, d4.prev_distinct) == (1, 0)
    assert d4.novelty == 1.0 and d4.jaccard == 0.0
    assert out[("s2", 0)].novelty == 1.0


def test_set_churn_sql_tvf(spark, tmp_path):
    """set_churn('<table>','<group>','<value>'[,'<time>'][,days]) in
    plain SQL — the batch twin of the streaming monitor, with the
    trend_robust arg conventions (quoted-digit day width rebinds)."""
    import pytest

    from ella_spark import Column, Ella

    db = Ella.create(str(tmp_path / "db"), spark)
    t = db.create_topic(
        "pages",
        [Column("src", "string", required=True), Column("url", "string")],
    )
    day = 86_400_000_000_000
    with t.publish() as pub:
        for u in ["a", "b", "c", "d"]:
            pub.write(0 * day + hash(u) % 1000, "crawl", u)
        for u in ["c", "d", "e", "f"]:
            pub.write(1 * day + hash(u) % 1000, "crawl", u)

    out = db.query(
        "SELECT * FROM set_churn('pages', 'src', 'url') "
        "ORDER BY bucket_start"
    ).df.toPandas()
    assert list(out.novelty) == [1.0, 0.5]
    assert list(out.jaccard) == [0.0, 0.333333]

    # quoted day width rebinds (both days land in ONE 7-day bucket)
    wide = db.query(
        "SELECT * FROM set_churn('pages', 'src', 'url', '7')"
    ).df.toPandas()
    assert len(wide) == 1 and wide.cur_distinct.iloc[0] == 6

    with pytest.raises(ValueError, match="unknown table"):
        db.query("SELECT * FROM set_churn('nope', 'src', 'url')")

    # the saved-dashboard contract shared with the drift/statqa TVFs:
    # a stored view keeps the durable TVF text and re-scores CURRENT
    # data at every read
    db.query(
        "CREATE VIEW churn_board AS "
        "SELECT * FROM set_churn('pages', 'src', 'url')"
    )
    assert db.query("SELECT count(*) AS n FROM churn_board").df.collect()[
        0
    ].n == 2
    with t.publish() as pub:  # a third day arrives...
        pub.write(2 * day, "crawl", "g")
    assert db.query("SELECT count(*) AS n FROM churn_board").df.collect()[
        0
    ].n == 3  # ...and the stored view scored it
