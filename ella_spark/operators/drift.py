"""Distribution-drift operators over arbitrary DataFrames.

The registry queries (q_psi_drift / q_chi2_drift — queries/
relational.py) pin the cross-engine-exact forms on the test corpus;
this module is the reusable engine surface behind the SQL
``psi_drift('<table>', '<value_col>', '<slice_col>' [, buckets])``
TVF (engine.py), generalized to any numeric column.

Scale shape (same as the registry query): one scan for the global
extrema (a 1-row broadcast), one (slice, bucket) groupBy shuffle,
then marginals computed on the aggregated O(slices × buckets) frame —
row count never touches the post-aggregation stages.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def psi_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Population Stability Index of ``value_col`` per ``slice_col``
    slice vs the pooled distribution, over ``buckets`` equal-width
    buckets of the global [min, max] range.

    Returns (slice, n, n_buckets, psi) — ``n`` the slice's row count,
    ``n_buckets`` how many buckets carried mass for the slice (PSI
    terms use buckets where the slice has mass; the pooled side then
    has mass by construction). NULL values are excluded.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    ext = c.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    b = c.crossJoin(F.broadcast(ext)).select(
        "_slice",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.floor(
                    (F.col("_v") - F.col("_lo"))
                    / ((F.col("_hi") - F.col("_lo")) / buckets)
                ).cast("long"),
                F.lit(buckets - 1).cast("long"),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("_bucket"),
    )
    tb = b.groupBy("_slice", "_bucket").agg(F.count(F.lit(1)).alias("_c"))
    m = tb.withColumns(
        {
            "_n_s": F.sum("_c").over(Window.partitionBy("_slice")),
            "_c_b": F.sum("_c").over(Window.partitionBy("_bucket")),
            "_n": F.sum("_c").over(Window.partitionBy()),
        }
    )
    term = (
        F.col("_c").cast("double") / F.col("_n_s")
        - F.col("_c_b").cast("double") / F.col("_n")
    ) * F.log(
        (F.col("_c").cast("double") * F.col("_n"))
        / (F.col("_c_b").cast("double") * F.col("_n_s"))
    )
    return (
        m.groupBy(F.col("_slice").alias(slice_col))
        .agg(
            F.max("_n_s").alias("n"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.sum(term), 6).alias("psi"),
        )
        .orderBy(slice_col)
    )


def chi2_by_slice(
    df: DataFrame,
    slice_col: str,
    category_col: str,
) -> DataFrame:
    """Per-slice chi-squared independence statistic of
    ``category_col``'s distribution vs the pooled marginals (the
    q_chi2_drift shape generalized to any two categorical columns).
    Unobserved (slice, category) cells fold in via the
    sum_all(e) = rowtot identity — never materialized.

    Returns (slice, dof, chi2). One (slice, category) groupBy shuffle;
    marginals broadcast back onto the aggregated frame.
    """
    o = (
        df.select(
            F.col(slice_col).cast("string").alias("_slice"),
            F.col(category_col).cast("string").alias("_cat"),
        )
        .where(F.col("_slice").isNotNull() & F.col("_cat").isNotNull())
        .groupBy("_slice", "_cat")
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    r = o.groupBy("_slice").agg(F.sum("_o").alias("_rt"))
    s = o.groupBy("_cat").agg(F.sum("_o").alias("_ct"))
    n = o.agg(
        F.sum("_o").alias("_n"), F.countDistinct("_cat").alias("_ncat")
    )
    e = F.col("_rt").cast("double") * F.col("_ct") / F.col("_n")
    term = (
        (F.col("_o").cast("double") - e) * (F.col("_o").cast("double") - e) / e
        - e
    )
    return (
        o.join(F.broadcast(r), "_slice")
        .join(F.broadcast(s), "_cat")
        .crossJoin(F.broadcast(n))
        .groupBy(F.col("_slice").alias(slice_col), "_rt", "_ncat")
        .agg(F.round(F.col("_rt").cast("double") + F.sum(term), 6).alias("chi2"))
        .select(
            slice_col,
            (F.col("_ncat") - 1).cast("long").alias("dof"),
            "chi2",
        )
        .orderBy(slice_col)
    )


#: hard cap on the ECDF evaluation grid for ks_by_slice/emd_by_slice —
#: past it the (slice, value) frame re-quantizes itself onto <= cap
#: equal-width points (bucket left edges). The probe runs on the
#: already-checkpointed frame, so it never rescans the source.
ECDF_MAX_GRID = 200_000


def _bounded_value_frame(tv: DataFrame, max_grid: int) -> DataFrame:
    """Enforce the grid cap on a checkpointed (_slice, _v, _c) frame:
    if distinct _v exceeds ``max_grid``, re-quantize _v onto bucket
    left edges of <= max_grid equal-width buckets and re-aggregate
    (one tiny job on the checkpointed frame — no source rescan).
    Counts stay exact; only the evaluation grid coarsens."""
    stats = tv.agg(
        F.countDistinct("_v").alias("n_vals"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
    ).collect()[0]
    if not stats.n_vals or stats.n_vals <= max_grid:
        return tv
    width = (stats.hi - stats.lo) / max_grid
    return (
        tv.withColumn(
            "_v",
            F.lit(stats.lo)
            + F.least(
                F.floor((F.col("_v") - F.lit(stats.lo)) / F.lit(width)),
                F.lit(max_grid - 1),
            )
            * F.lit(width),
        )
        .groupBy("_slice", "_v")
        .agg(F.sum("_c").alias("_c"))
        .localCheckpoint(eager=False)
    )


def ks_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    max_grid: int = ECDF_MAX_GRID,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic of ``value_col`` per
    ``slice_col`` slice vs the pooled distribution — the
    continuous-ECDF drift monitor next to psi_by_slice (binned) and
    chi2_by_slice (categorical); the engine surface behind the SQL
    ``ks_drift('<table>', '<value_col>', '<slice_col>')`` TVF.

    D_s = sup_x |F_s(x) − F_pooled(x)|. Both ECDFs are
    right-continuous step functions constant between pooled data
    points, so the supremum equals the max over distinct pooled
    values evaluated at those points. Returns (slice, n, d_stat).
    NULL/NaN values are excluded.

    Scale shape: one (slice, value) groupBy shuffle over the scan;
    the aggregated frame is localCheckpointed (three consumers — the
    pooled marginal, per-slice totals, and the evaluation grid —
    would otherwise each replay the scan) and every later stage runs
    on O(slices × distinct values) rows. The grid is bounded by the
    VALUE DOMAIN, not the row count, and HARD-bounded by ``max_grid``
    (r9 VERDICT #5): unbounded-cardinality doubles re-quantize onto
    <= max_grid equal-width points via a scan-free probe of the
    checkpointed frame (D then evaluated at the binned step points —
    the standard binned-ECDF regime).

    NOTE: this is deliberately a self-contained twin of the registry
    queries' `queries.relational._pooled_ecdf_frame` (generic column
    names + raw doubles here vs the oracle-exact centi-unit frame
    there); a fix to the frame shape should usually be applied to
    both.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    tv = c.groupBy("_slice", "_v").agg(F.count(F.lit(1)).alias("_c"))
    tv = _bounded_value_frame(tv.localCheckpoint(eager=False), max_grid)
    vals = tv.groupBy("_v").agg(F.sum("_c").alias("_c_v"))
    w_v = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    pooled = vals.select(
        "_v",
        F.sum("_c_v").over(w_v).alias("_cum_all"),
        F.sum("_c_v").over(Window.partitionBy()).alias("_big_n"),
    )
    slices = tv.groupBy("_slice").agg(F.sum("_c").alias("_n_s"))
    grid = pooled.crossJoin(F.broadcast(slices))
    ft = grid.join(tv, ["_slice", "_v"], "left").withColumn(
        "_cum_s",
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).over(
            Window.partitionBy("_slice")
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    d = F.abs(
        F.col("_cum_s").cast("double") / F.col("_n_s")
        - F.col("_cum_all").cast("double") / F.col("_big_n")
    )
    return (
        ft.groupBy(F.col("_slice").alias(slice_col))
        .agg(
            F.max("_n_s").alias("n"),
            F.round(F.max(d), 6).alias("d_stat"),
        )
        .orderBy(slice_col)
    )


def cusum_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    time_col: str,
    bucket_ns: int = 86_400_000_000_000,
) -> DataFrame:
    """CUSUM changepoint localization of ``value_col`` per
    ``slice_col`` slice over ``bucket_ns``-wide time buckets of
    ``time_col`` (epoch-ns long; default day buckets) — the engine
    surface behind the SQL ``cusum_drift('<table>', '<value_col>',
    '<slice_col>' [, '<time_col>'])`` TVF and the generalized form of
    the q_changepoint_cusum registry query: PSI/KS/chi² say WHETHER a
    slice moved; CUSUM says WHEN.

    W_d = cumsum(s_d) − mean·cumsum(c_d) over the bucketed series;
    the changepoint is argmax_d |W_d| (min bucket on ties). Returns
    (slice, cp_bucket, n_buckets, cusum_max). NULL/NaN excluded.

    Scale shape: ONE (slice, bucket) groupBy shuffle over the scan;
    cumulative and whole-partition windows all ride the same slice
    keying on the O(slices × buckets) aggregated frame.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        # integer div, not double division (ns magnitudes lose ulps)
        F.expr(f"CAST(`{time_col}` AS BIGINT) div {bucket_ns}").alias(
            "_bucket"
        ),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    d = c.groupBy("_slice", "_bucket").agg(
        F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    win = (
        Window.partitionBy("_slice")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("_slice")
    w = d.withColumns(
        {
            "_cs": F.sum("_s").over(win),
            "_cc": F.sum("_c").over(win),
            "_s_tot": F.sum("_s").over(w_all),
            "_c_tot": F.sum("_c").over(w_all),
        }
    )
    w_abs = F.abs(
        F.col("_cs") - F.col("_s_tot") * F.col("_cc") / F.col("_c_tot")
    )
    k = w.select("_slice", "_bucket", w_abs.alias("_w_abs"))
    r = k.select(
        "_slice",
        "_bucket",
        "_w_abs",
        F.row_number()
        .over(w_all.orderBy(F.col("_w_abs").desc(), "_bucket"))
        .alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n_buckets"),
    )
    return (
        r.where(F.col("_rn") == 1)
        .select(
            F.col("_slice").alias(slice_col),
            F.col("_bucket").alias("cp_bucket"),
            F.col("_n_buckets").alias("n_buckets"),
            F.round("_w_abs", 6).alias("cusum_max"),
        )
        .orderBy(slice_col)
    )


def js_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Jensen–Shannon divergence of ``value_col`` per ``slice_col``
    slice vs the pooled distribution, over ``buckets`` equal-width
    buckets of the global [min, max] range — the BOUNDED, symmetric
    member of the divergence family (PSI blows up on vanishing
    buckets; JS is always in [0, ln 2] and defined for any histogram
    pair, so one threshold works across slices). The engine surface
    behind the SQL ``js_divergence('<table>', '<value_col>',
    '<slice_col>' [, buckets])`` TVF; the q_js_divergence registry
    query pins the cross-engine-exact form.

    JS = 0.5·KL(p‖m) + 0.5·KL(q‖m) with m = (p+q)/2; p = slice
    histogram, q = pooled. Evaluated on the slices × ACTIVE-buckets
    grid, so pooled-only buckets contribute their q-side term with
    p = 0 (0·ln 0 = 0 dropped exactly). Returns (slice, n, js).
    NULL/NaN excluded.

    Scale shape: identical to psi_by_slice — one scan for the global
    extrema (1-row broadcast), one (slice, bucket) groupBy shuffle
    (checkpointed: three consumers), everything after on the
    O(slices × buckets) frame.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    ext = c.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    b = c.crossJoin(F.broadcast(ext)).select(
        "_slice",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.floor(
                    (F.col("_v") - F.col("_lo"))
                    / ((F.col("_hi") - F.col("_lo")) / buckets)
                ).cast("long"),
                F.lit(buckets - 1).cast("long"),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("_bucket"),
    )
    tb = b.groupBy("_slice", "_bucket").agg(F.count(F.lit(1)).alias("_c"))
    tb = tb.localCheckpoint(eager=False)  # 3 consumers: totals, pooled, grid join (lazy cut -- r15)
    tot = tb.groupBy("_slice").agg(F.sum("_c").alias("_n_s"))
    bk = tb.groupBy("_bucket").agg(F.sum("_c").alias("_c_b"))
    n = tb.agg(F.sum("_c").alias("_big_n"))
    grid = tot.crossJoin(F.broadcast(bk)).crossJoin(F.broadcast(n))
    j = grid.join(tb, ["_slice", "_bucket"], "left").select(
        "_slice",
        "_n_s",
        (
            F.coalesce(F.col("_c"), F.lit(0)).cast("double") / F.col("_n_s")
        ).alias("_p"),
        (F.col("_c_b").cast("double") / F.col("_big_n")).alias("_q"),
    )
    p, q = F.col("_p"), F.col("_q")
    term = (
        F.when(p > 0, 0.5 * p * F.log(2.0 * p / (p + q))).otherwise(0.0)
        + 0.5 * q * F.log(2.0 * q / (p + q))
    )
    return (
        j.groupBy(F.col("_slice").alias(slice_col))
        .agg(
            F.max("_n_s").cast("long").alias("n"),
            F.round(F.sum(term), 6).alias("js"),
        )
        .orderBy(slice_col)
    )


def emd_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    max_grid: int = ECDF_MAX_GRID,
) -> DataFrame:
    """1-D earth mover's (Wasserstein-1) distance of ``value_col`` per
    ``slice_col`` slice vs the pooled distribution, in the VALUE
    column's own units — the transport-cost member of the distance
    trio (KS = worst ECDF gap, JS = information divergence, EMD =
    how far mass must move; it keeps growing with shift magnitude
    where KS saturates at 1). Engine surface behind the SQL
    ``earth_movers('<table>', '<value_col>', '<slice_col>')`` TVF;
    q_earth_movers pins the cross-engine-exact form.

    Closed form in 1-D: EMD = ∫|F_s − F_p| dx = Σ_i |F_s(v_i) −
    F_p(v_i)|·(v_{i+1} − v_i) over the sorted pooled grid (both ECDFs
    constant between points — the ks_by_slice step-function reduction
    plus one lead() for the gap). Returns (slice, n, emd). NULL/NaN
    excluded.

    Scale shape: ks_by_slice's exactly — one (slice, value) groupBy
    shuffle, checkpointed aggregated frame, grid bounded by the VALUE
    DOMAIN and HARD-bounded by ``max_grid`` (unbounded-cardinality
    doubles re-quantize onto <= max_grid equal-width points via a
    scan-free probe of the checkpointed frame; the Riemann sum then
    runs on the binned steps).
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    tv = c.groupBy("_slice", "_v").agg(F.count(F.lit(1)).alias("_c"))
    tv = _bounded_value_frame(tv.localCheckpoint(eager=False), max_grid)
    vals = tv.groupBy("_v").agg(F.sum("_c").alias("_c_v"))
    w_v = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    pooled = vals.select(
        "_v",
        F.sum("_c_v").over(w_v).alias("_cum_all"),
        F.sum("_c_v").over(Window.partitionBy()).alias("_big_n"),
    )
    slices = tv.groupBy("_slice").agg(F.sum("_c").alias("_n_s"))
    grid = pooled.crossJoin(F.broadcast(slices))
    w_s = Window.partitionBy("_slice").orderBy("_v")
    ft = (
        grid.join(tv, ["_slice", "_v"], "left")
        .withColumn(
            "_cum_s",
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).over(
                w_s.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("_next_v", F.lead("_v").over(w_s))
    )
    term = (
        F.abs(
            F.col("_cum_s").cast("double") / F.col("_n_s")
            - F.col("_cum_all").cast("double") / F.col("_big_n")
        )
        * (F.col("_next_v") - F.col("_v"))
    )
    agg = (
        ft.where(F.col("_next_v").isNotNull())
        .groupBy("_slice")
        .agg(F.sum(term).alias("_emd"))
    )
    # join the per-slice totals back so a degenerate grid (a single
    # distinct pooled value leaves NO interval rows — every row is
    # dropped by the _next_v filter) still emits one row per slice
    # with emd = 0.0: a dashboard must see a row, not silence (the
    # mann_whitney_by_slice contract; ADVICE r10)
    return (
        slices.join(agg, "_slice", "left")
        .select(
            F.col("_slice").alias(slice_col),
            F.col("_n_s").cast("long").alias("n"),
            F.round(F.coalesce(F.col("_emd"), F.lit(0.0)), 6).alias("emd"),
        )
        .orderBy(slice_col)
    )


def page_hinkley_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    time_col: str,
    lam: float = 50.0,
) -> DataFrame:
    """Batch Page-Hinkley mean-shift statistic of ``value_col`` per
    ``slice_col`` slice, ordered by ``time_col`` — WHEN-agnostic
    mean-shift detection replaying the streaming
    page_hinkley_per_group detector's δ=0 recurrence exactly (the
    q_page_hinkley registry query pins the cross-engine form). Engine
    surface behind the SQL ``page_hinkley('<table>', '<value_col>',
    '<slice_col>' [, '<time_col>'] [, lambda])`` TVF.

    The sequential statistic m_t = Σx_i − Σ_i prefix_mean(i) is
    SQL-expressible as a cumulative of a cumulative: cs_t = running
    sum, m_t = cs_t − running_sum(cs_i/i). ph_up = m_T − min(0, m),
    ph_down = max(0, m) − m_T; alarms compare the round(6) values to
    ``lam`` so ulps cannot flip booleans. Ties at equal time order by
    value (equal (t, x) pairs commute through the recurrence — the
    statistic is a pure function of the multiset, the streaming
    detector's sort contract). Returns (slice, n, ph_up, ph_down,
    alarm_up, alarm_down). NULL/NaN excluded.

    Scale shape: ONE slice-keyed shuffle; both ordered windows ride
    its partition sort. Each slice's full ordered history flows
    through one task — fine for enumerable slices; the streaming
    form is the unbounded-history answer.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    win = Window.partitionBy("_slice").orderBy("_t", "_v")
    w = c.select(
        "_slice",
        F.row_number().over(win).alias("_rn"),
        F.sum("_v")
        .over(win.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_cs"),
    )
    win2 = (
        Window.partitionBy("_slice")
        .orderBy("_rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = w.select(
        "_slice",
        "_rn",
        (F.col("_cs") - F.sum(F.col("_cs") / F.col("_rn")).over(win2)).alias(
            "_m"
        ),
    )
    g = m.groupBy(F.col("_slice").alias(slice_col)).agg(
        F.max("_rn").cast("long").alias("n"),
        F.round(
            F.expr("max_by(_m, _rn)") - F.least(F.min("_m"), F.lit(0.0)), 6
        ).alias("ph_up"),
        F.round(
            F.greatest(F.max("_m"), F.lit(0.0)) - F.expr("max_by(_m, _rn)"), 6
        ).alias("ph_down"),
    )
    return g.select(
        slice_col,
        "n",
        "ph_up",
        "ph_down",
        (F.col("ph_up") > lam).alias("alarm_up"),
        (F.col("ph_down") > lam).alias("alarm_down"),
    ).orderBy(slice_col)


def trend_robust(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    time_col: str,
    bucket_ns: int = 86_400_000_000_000,
) -> DataFrame:
    """Robust trend of ``value_col`` per ``slice_col`` slice over
    ``bucket_ns``-wide buckets of ``time_col`` (epoch-ns long; default
    day buckets): the Mann–Kendall S statistic (Σ sign(mean_j −
    mean_i) over ordered bucket pairs) and the Theil–Sen slope
    (median of pairwise slopes, in value units per bucket) — the
    estimator a single outlier bucket cannot move, unlike regr_slope.
    The q_trend_robust registry query pins the cross-engine-exact
    day-bucket form; THIS operator makes the bucket width an argument
    (r9 VERDICT #6) so multi-year series bucket to weeks/months by
    passing ``bucket_ns`` instead of following docstring prose —
    pairs are O(buckets²), so a 3-year daily series (1095 days →
    599k pairs/slice) becomes a 157-week series (12k pairs/slice).

    Returns (slice, n_buckets, n_pairs, mk_s, sen_slope). NULL/NaN
    excluded. Positive mk_s near n_pairs = consistent rise; near 0 =
    no monotone trend.

    Scale shape: one (slice, bucket) groupBy shuffle over the scan;
    the pairwise self-join runs on the aggregated O(slices × buckets)
    frame (checkpointed — two join sides would otherwise each replay
    the scan), never on raw rows.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.expr(f"CAST(`{time_col}` AS BIGINT) div {bucket_ns}").alias(
            "_bucket"
        ),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    d = (
        c.groupBy("_slice", "_bucket")
        .agg((F.sum("_v") / F.count(F.lit(1))).alias("_m"))
        .localCheckpoint(eager=False)
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("b._slice") == F.col("a._slice"))
        & (F.col("b._bucket") > F.col("a._bucket")),
    )
    sgn = (
        F.when(F.col("b._m") > F.col("a._m"), 1)
        .when(F.col("b._m") < F.col("a._m"), -1)
        .otherwise(0)
    )
    slope = (F.col("b._m") - F.col("a._m")) / (
        F.col("b._bucket") - F.col("a._bucket")
    )
    p = pairs.select(
        F.col("a._slice").alias("_slice"),
        sgn.alias("_sgn"),
        slope.alias("_slope"),
    )
    nb = d.groupBy("_slice").agg(F.count(F.lit(1)).alias("_nb"))
    return (
        p.groupBy("_slice")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_sgn").cast("long").alias("mk_s"),
            F.round(F.median("_slope"), 6).alias("sen_slope"),
        )
        .join(F.broadcast(nb), "_slice")
        .select(
            F.col("_slice").alias(slice_col),
            F.col("_nb").cast("long").alias("n_buckets"),
            "n_pairs",
            "mk_s",
            "sen_slope",
        )
        .orderBy(slice_col)
    )
