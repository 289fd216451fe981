"""Statistical-QA operators over arbitrary DataFrames — the reusable
engine surface behind the round-10 SQL TVFs ``mann_whitney(...)``,
``grubbs(...)``, ``levene(...)`` and ``runs_test(...)`` (engine.py),
generalized to any numeric/slice columns the way operators/drift.py
generalizes the drift registry queries.

The registry queries (q_mann_whitney / q_grubbs_outlier /
q_levene_variance / q_runs_test — queries/relational.py,
timeseries.py) pin the cross-engine-exact centi-unit forms on the
test corpus; these operators take raw doubles (no oracle contract)
but keep the same plan shapes: ONE slice-keyed shuffle each, all
post-aggregation work on bounded frames.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def mann_whitney_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
) -> DataFrame:
    """Mann–Whitney U / ROC-AUC of each ``slice_col`` slice vs the
    REST of the pooled ``value_col`` distribution — the rank-based
    location drift score (AUC 0.5 = no shift; also exactly the
    ROC-AUC of the slice-membership indicator). Tie handling uses
    exact average ranks over the pooled step grid: 2·R = Σ c_sv ·
    (2·cum_all − c_v + 1), one double division at the end.

    Returns (slice, n, m, u2, auc) with ``u2 = 2·U`` accumulated in
    DECIMAL(38,0) — exact to 1e38, where int64 would wrap silently at
    ~3e9 pooled rows (2R is O(N²)). A slice that IS the whole table
    (m = 0) still emits its row with u2 = 0 and auc NULL — the test is
    inapplicable, which a dashboard must see as a row, not silence.
    NULL/NaN excluded. Scale: ONE (slice, value) groupBy shuffle; the
    rank computation is an equi-join on the aggregated value grid
    (bounded by the value domain — quantize upstream at unbounded
    cardinality, e.g. psi_by_slice's bucketing).
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    tv = c.groupBy("_slice", "_v").agg(F.count(F.lit(1)).alias("_c"))
    tv = tv.localCheckpoint(eager=False)  # 2 consumers: pooled grid + rank join (lazy cut -- r15)
    vals = tv.groupBy("_v").agg(F.sum("_c").alias("_c_v"))
    w_v = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    pooled = vals.select(
        "_v",
        "_c_v",
        F.sum("_c_v").over(w_v).alias("_cum_all"),
        F.sum("_c_v").over(Window.partitionBy()).alias("_big_n"),
    )
    # the inner 2*cum_all must ALSO leave int64 before multiplying,
    # or it wraps at ~4.6e18 pooled rows before the decimal bound
    term = F.col("_c").cast("decimal(19,0)") * (
        2 * F.col("_cum_all").cast("decimal(19,0)") - F.col("_c_v") + 1
    )
    r = (
        tv.join(pooled, "_v")
        .groupBy("_slice")
        .agg(
            F.sum("_c").cast("long").alias("_n"),
            F.sum(term).cast("decimal(38,0)").alias("_two_r"),
            F.max("_big_n").cast("long").alias("_big_n"),
        )
    )
    u2 = (
        F.col("_two_r")
        - F.col("_n").cast("decimal(19,0)") * (F.col("_n") + 1)
    ).cast("decimal(38,0)")
    m = F.col("_big_n") - F.col("_n")
    return r.select(
        F.col("_slice").alias(slice_col),
        F.col("_n").alias("n"),
        m.alias("m"),
        u2.alias("u2"),
        F.when(
            m > 0,
            F.round(
                u2.cast("double") / (2.0 * F.col("_n") * m.cast("double")),
                6,
            ),
        ).alias("auc"),
    ).orderBy(slice_col)


def grubbs_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
) -> DataFrame:
    """Grubbs' outlier statistic per slice: G = max|x − mean|/s (the
    studentized extreme deviation — the single-corrupt-reading screen
    for ingest QA). Returns (slice, n, outlier_dev, g_stat); slices
    with n < 3 or zero variance are gated out (G undefined).

    Scale: ONE plain groupBy aggregate — max|x − mean| equals
    greatest(max − mean, mean − min) (the extreme deviation is always
    AT an extreme value), so no per-row window pass is needed;
    map-side partials shrink every partition before the shuffle and
    a skewed hot slice never funnels through one window task.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    t = c.groupBy("_slice").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.greatest(
            F.max("_v") - F.avg("_v"), F.avg("_v") - F.min("_v")
        ).alias("_max_dev"),
        F.stddev_samp("_v").alias("_sd"),
    )
    return (
        t.where((F.col("n") >= 3) & (F.col("_sd") > 0))
        .select(
            F.col("_slice").alias(slice_col),
            "n",
            F.round("_max_dev", 6).alias("outlier_dev"),
            F.round(F.col("_max_dev") / F.col("_sd"), 6).alias("g_stat"),
        )
        .orderBy(slice_col)
    )


def levene_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
) -> DataFrame:
    """Levene's W for variance homogeneity across slices (the
    mean-centered form): location monitors miss a slice whose mean
    holds while its spread doubles; W is the dispersion-drift test.
    Returns ONE row (n, k, w_stat); w_stat is NULL in the two
    inapplicable cases — k = 1 (nothing to compare across; the (k−1)
    denominator is 0) and SSW = 0 (every slice's absolute deviations
    constant) — read k to tell them apart.

    Scale: ONE slice-keyed shuffle (totals via whole-partition
    windows, per-slice agg on the same keying); the k-row frame is
    checkpointed before the two-consumer grand-mean fan-out.
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    w_all = Window.partitionBy("_slice")
    z = c.withColumn("_mean", F.avg("_v").over(w_all)).select(
        "_slice", F.abs(F.col("_v") - F.col("_mean")).alias("_z")
    )
    t = z.groupBy("_slice").agg(
        F.count(F.lit(1)).cast("long").alias("_n_s"),
        F.avg("_z").alias("_zbar_s"),
        ((F.count(F.lit(1)) - 1) * F.var_samp("_z")).alias("_ssw_s"),
    )
    t = t.localCheckpoint(eager=False)
    g = t.agg(
        F.sum("_n_s").cast("long").alias("_big_n"),
        F.count(F.lit(1)).cast("long").alias("_k"),
        (F.sum(F.col("_n_s") * F.col("_zbar_s")) / F.sum("_n_s")).alias(
            "_zbar"
        ),
    )
    ssb = (
        F.col("_n_s")
        * (F.col("_zbar_s") - F.col("_zbar"))
        * (F.col("_zbar_s") - F.col("_zbar"))
    )
    return (
        t.crossJoin(F.broadcast(g))
        .groupBy(F.col("_big_n").alias("n"), F.col("_k").alias("k"))
        .agg(
            F.when(
                (F.col("k") > 1) & (F.sum("_ssw_s") > 0),
                F.round(
                    (F.col("n").cast("double") - F.col("k"))
                    / (F.col("k") - 1)
                    * F.sum(ssb)
                    / F.sum("_ssw_s"),
                    6,
                ),
            ).alias("w_stat")
        )
    )


def runs_test_by_slice(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    time_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test per slice over the ``time_col``-
    ordered sequence of above/below-slice-mean indicators: z << 0 =
    values clump (regime persistence, stuck sensors, batched writes),
    z >> 0 = faster-than-chance oscillation — the randomness audit
    mean/variance monitors are blind to. Exactly-mean rows drop
    (standard tie handling); slices need n₁, n₀ >= 2 for σ > 0.
    Returns (slice, n, n1, n0, n_runs, z_runs).

    Scale: ONE slice-keyed shuffle; totals via whole-partition
    windows, the ordered lag() and the final agg ride the same
    keying (each slice's ordered pass is one task — fine for
    enumerable slices).
    """
    c = df.select(
        F.col(slice_col).cast("string").alias("_slice"),
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))
    w_all = Window.partitionBy("_slice")
    s = (
        c.withColumn("_mean", F.avg("_v").over(w_all))
        .select(
            "_slice",
            "_t",
            "_v",
            F.when(F.col("_v") > F.col("_mean"), 1)
            .when(F.col("_v") < F.col("_mean"), 0)
            .alias("_sgn"),
        )
        .where(F.col("_sgn").isNotNull())
    )
    w_ord = Window.partitionBy("_slice").orderBy("_t", "_v")
    f = s.select(
        "_slice",
        "_sgn",
        F.when(F.lag("_sgn").over(w_ord).isNull(), 1)
        .when(F.col("_sgn") != F.lag("_sgn").over(w_ord), 1)
        .otherwise(0)
        .alias("_chg"),
    )
    t = f.groupBy("_slice").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_sgn").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("_sgn")).cast("long").alias("n0"),
        F.sum("_chg").cast("long").alias("n_runs"),
    )
    n, n1, n0 = F.col("n"), F.col("n1"), F.col("n0")
    mu = 1.0 + 2.0 * n1 * n0 / n
    var = (
        2.0 * n1 * n0 * (2.0 * n1 * n0 - n)
        / (n.cast("double") * n * (n - 1))
    )
    return (
        t.where((n1 >= 2) & (n0 >= 2))
        .select(
            F.col("_slice").alias(slice_col),
            "n",
            "n1",
            "n0",
            "n_runs",
            F.round((F.col("n_runs") - mu) / F.sqrt(var), 6).alias("z_runs"),
        )
        .orderBy(slice_col)
    )
