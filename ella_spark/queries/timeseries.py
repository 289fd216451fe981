"""Time-series operators — the reference's core domain.

ella is a streaming time-series store; its SQL time surface is
``date_trunc`` / ``date_bin`` / ``date_part`` / ``now()`` inherited
from DataFusion (SURVEY.md §2.B date/time row; README.md:96-105 uses
``now()`` predicates to split history vs live). Time here follows the
SURVEY §1.4 shim: the events table's nanosecond timestamps surface as
LongType epoch-ns (lossless), compared against the oracle at µs
precision since DuckDB's parquet reader truncates ns → µs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ella_spark.queries import register
from ella_spark.sources import load_table

_NS_PER_SEC = 1_000_000_000
_NS_PER_MIN = 60 * _NS_PER_SEC


@register(
    "q_date_bin_5min",
    oracle=f"""
    SELECT (epoch_ns(ts) // {5 * _NS_PER_MIN}) * {5 * _NS_PER_MIN // 1000} AS bucket_us,
           event_type,
           count(*)             AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,8))), 2) AS DOUBLE)
             AS total_value,
           round(CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE)
                 / count(value), 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="date_bin parity: fixed 5-minute buckets over ns time (the TSDB workhorse; "
    "reference gets this from DataFusion date_bin — SURVEY.md §2.B). "
    "DECIMAL sums: a double sum's last-ulp order dependence flips the "
    "2-decimal rounding once buckets grow (measured at sf0.1) — the "
    "decimal path is exact cross-engine at any bucket size, and the "
    "avg derives from the same exact sum.",
)
def q_date_bin_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bin_ns = 5 * _NS_PER_MIN
    dec_sum = F.sum(F.col("value").cast("decimal(28,8)"))
    return (
        ev.groupBy(
            F.expr(f"(ts div {bin_ns}) * {bin_ns // 1000}").alias("bucket_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dec_sum, 2).cast("double").alias("total_value"),
            F.round(
                dec_sum.cast("double") / F.count("value"), 4
            ).alias("avg_value"),
        )
    )


@register(
    "q_date_trunc_parts",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           CAST(year(o_orderdate) AS BIGINT)      AS order_year,
           CAST(month(o_orderdate) AS BIGINT)     AS order_mm,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS order_dd,
           count(*)                          AS n_orders,
           round(sum(o_totalprice), 2)       AS month_rev
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
    doc="date_trunc + date_part extraction and monthly aggregation.",
)
def q_date_trunc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_mm"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("order_dd"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_rev"),
        )
    )


@register(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, (epoch_ns(ts) // 1000) AS ts_us
    FROM (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    doc="Latest-row-per-key (ella's 'current value of each series' idiom).",
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.expr("ts div 1000").alias("ts_us"))
    )


@register(
    "q_time_range_scan",
    oracle="""
    SELECT event_id, user_id, event_type, value, (epoch_ns(ts) // 1000) AS ts_us
    FROM events
    WHERE epoch_ns(ts) >= 1704070000000000000 AND epoch_ns(ts) < 1704080000000000000
    """,
    doc="Bounded time-range scan: the `WHERE time < now()` history read "
    "(reference README.md:96-105); predicate pushes to parquet row groups.",
)
def q_time_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.sources import scan_events_range

    ev = scan_events_range(
        spark, sf_dir, 1704070000000000000, 1704080000000000000
    )
    return ev.select(
        "event_id", "user_id", "event_type", "value", F.expr("ts div 1000").alias("ts_us")
    )


@register(
    "q_session_gaps",
    oracle="""
    WITH seq AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
             lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ns
      FROM events)
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN prev_ns IS NULL OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM seq
    GROUP BY user_id
    """,
    doc="Sessionization by inactivity gap (30 min) — windowed lag + conditional sum.",
)
def q_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = 30 * 60 * 1_000_000_000
    return (
        ev.withColumn("prev_ns", F.lag("ts").over(w))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("prev_ns").isNull()
                    | ((F.col("ts") - F.col("prev_ns")) > gap_ns),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_sessions"),
        )
    )


@register(
    "q_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           event_type
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    doc="Semi-structured JSON property extraction from the events payload.",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", k.alias("prop_k"), "event_type")
        .where(F.col("prop_k").isNotNull() & (F.col("prop_k") > 50))
    )


@register(
    "q_event_type_pivot",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS n_signup,
           CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS n_error
    FROM events
    GROUP BY user_id
    """,
    doc="Conditional-count pivot of event types per user (FILTER clause parity).",
)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return (
            F.count(F.when(F.col("event_type") == t, 1)).cast("bigint").alias(f"n_{t}")
        )

    return ev.groupBy("user_id").agg(
        cnt("click"), cnt("purchase"), cnt("signup"), cnt("error")
    )


@register(
    "q_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           (epoch_ns(p.ts) // 1000) AS purchase_us,
           (SELECT max(epoch_ns(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) // 1000 AS last_click_us
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="As-of join: each purchase matched to the latest preceding click per user. "
    "Spark-first: union both streams, one window pass (no per-row subquery).",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SAME-SOURCE as-of: both sides come from the events table, so tag
    # rows in ONE scan and run one window pass per user — one scan,
    # one shuffle. (The general two-table form is
    # operators.temporal.asof_join — same union-window plan, but with
    # genuinely distinct sources; instantiating it here would scan
    # events twice, once per filtered side.) rangeBetween so a click
    # at exactly the purchase ns matches the oracle's `c.ts <= p.ts`.
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_ns", F.max("click_ts").over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.expr("ts div 1000").alias("purchase_us"),
            F.expr("last_click_ns div 1000").alias("last_click_us"),
        )
    )


@register(
    "q_gap_fill",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // {10 * _NS_PER_MIN} AS b, value, event_id
      FROM events WHERE user_id < 5),
    binned AS (
      SELECT user_id, b, max_by(value, event_id) AS v
      FROM e GROUP BY user_id, b),
    bounds AS (
      SELECT user_id, min(b) AS lo, max(b) AS hi FROM binned GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(range(lo, hi + 1)) AS b FROM bounds),
    j AS (
      SELECT g.user_id, g.b, binned.v
      FROM grid g LEFT JOIN binned ON g.user_id = binned.user_id AND g.b = binned.b)
    SELECT user_id,
           b * {10 * _NS_PER_MIN // 1000} AS bucket_us,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS v_filled
    FROM j
    """,
    doc="Resample to a fixed 10-minute grid + forward fill (gap fill): "
    "the hypertable/TSDB downsampling workhorse. Grid generation is "
    "per-key sequence+explode (no driver loop); the fill is one "
    "running last(ignorenulls) window — a single shuffle on user_id.",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    bin_ns = 10 * _NS_PER_MIN
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 5)
    binned = ev.groupBy(
        "user_id", F.expr(f"ts div {bin_ns}").alias("b")
    ).agg(F.max_by("value", "event_id").alias("v"))
    grid = (
        binned.groupBy("user_id")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("b"),
        )
    )
    j = grid.join(binned, ["user_id", "b"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        (F.col("b") * (bin_ns // 1000)).alias("bucket_us"),
        F.round(F.last("v", ignorenulls=True).over(w), 2).alias("v_filled"),
    )


@register(
    "q_rolling_1h",
    oracle=f"""
    SELECT user_id, event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts)
             RANGE BETWEEN {3600 * _NS_PER_SEC} PRECEDING AND CURRENT ROW
           ), 2) AS rolling_1h
    FROM events
    WHERE user_id < 10
    """,
    doc="Value-range window frame: per-user rolling 1-hour sum over ns "
    "event time (RANGE BETWEEN <ns> PRECEDING — time-based frames "
    "without bucketing; one shuffle on user_id).",
)
def q_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-3600 * _NS_PER_SEC, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_1h"),
    )


@register(
    "q_range_join",
    oracle="""
    WITH w AS (
      SELECT o_orderkey AS w_key,
             o_orderdate AS w_start,
             o_orderdate + INTERVAL 30 DAY AS w_end
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100
    )
    SELECT w.w_key,
           count(*)                     AS n_shipped,
           round(sum(l.l_quantity), 2)  AS sum_qty
    FROM w
    JOIN lineitem l
      ON l.l_shipdate >= w.w_start
     AND l.l_shipdate <  w.w_end
    GROUP BY 1
    """,
    doc="Interval (range) join: point events matched into the top-100 "
    "orders' 30-day windows with NO equi key. Spark would execute the "
    "naive theta join as a broadcast-nested-loop (O(points x windows) "
    "— dead at 100 TB); instead each window explodes into its covered "
    "day buckets and the join becomes an EQUI-join on the bucket plus "
    "a residual range filter. The window side is bounded (top-k), the "
    "point side streams — output and shuffle stay linear in the "
    "points. (An UNBOUNDED overlapping-window set is inherently "
    "quadratic in SF no matter the join strategy — the bounded window "
    "set is the realistic incident/campaign-window shape.)",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    windows = (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            F.col("o_orderkey").alias("w_key"),
            F.col("o_orderdate").alias("w_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("w_end"),
        )
    )
    # explode each window into its day buckets (bounded fanout: 31)
    w_days = windows.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.to_date("w_start"),
                F.to_date(F.col("w_end") - F.expr("INTERVAL 1 SECOND")),
            )
        ),
    )
    points = li.select(
        F.col("l_shipdate"), F.col("l_quantity"), F.to_date("l_shipdate").alias("day")
    )
    joined = points.join(w_days, "day").where(
        (F.col("l_shipdate") >= F.col("w_start"))
        & (F.col("l_shipdate") < F.col("w_end"))
    )
    return joined.groupBy("w_key").agg(
        F.count(F.lit(1)).alias("n_shipped"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q_asof_join_forward",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           (epoch_ns(p.ts) // 1000) AS purchase_us,
           (SELECT min(epoch_ns(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts >= p.ts) // 1000 AS next_click_us
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="Forward as-of join: each purchase matched to the EARLIEST "
    "following click per user (the mirror of q_asof_join's backward "
    "direction — together they cover both ASOF JOIN directions). Same "
    "scalable plan: one shuffle by user_id, running min over an "
    "unbounded-following range frame.",
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same-source forward as-of: one tagged scan + one window (see
    # q_asof_join's note on why the two-table operator isn't
    # instantiated here).
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn("next_click_ns", F.min("click_ts").over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.expr("ts div 1000").alias("purchase_us"),
            F.expr("next_click_ns div 1000").alias("next_click_us"),
        )
    )


@register(
    "q_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_ns(ts)) AS tv
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(epoch_ns(e.ts)) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.tv
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.tc
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
    doc="Ordered funnel analysis (view -> click -> purchase): per step, "
    "the earliest qualifying event must FOLLOW the previous step's "
    "time. ONE events scan, ONE user_id shuffle: the step times are "
    "three stacked whole-partition window minima over the same "
    "partitioning (tv -> tc uses tv -> purchase flag uses tc), then a "
    "single per-user dedup + one global aggregate produces all three "
    "funnel counts — no per-step join, no per-step scan, no crossJoin "
    "of scalar counts.",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    typ, ts = F.col("event_type"), F.col("ts")
    staged = (
        ev.select("user_id", "event_type", "ts")
        .withColumn("tv", F.min(F.when(typ == "view", ts)).over(w))
        .withColumn(
            "tc",
            F.min(F.when((typ == "click") & (ts > F.col("tv")), ts)).over(w),
        )
        .withColumn(
            "tp",
            F.max(
                F.when((typ == "purchase") & (ts > F.col("tc")), F.lit(1))
            ).over(w),
        )
    )
    per_user = staged.select("user_id", "tv", "tc", "tp").distinct()
    return per_user.agg(
        F.count("tv").alias("n_view"),
        F.count("tc").alias("n_view_click"),
        F.count(F.when(F.col("tp") == 1, 1)).alias("n_view_click_purchase"),
    )


_WEEK_NS = 7 * 86_400 * 1_000_000_000


@register(
    "q_retention_cohorts",
    oracle=f"""
    WITH weeks AS (
      SELECT user_id,
             epoch_ns(ts) // {_WEEK_NS} AS week
      FROM events
    ), cohort AS (
      SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id
    )
    SELECT c.cohort_week,
           w.week - c.cohort_week AS week_offset,
           count(DISTINCT w.user_id) AS n_users
    FROM weeks w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY c.cohort_week, week_offset
    """,
    doc="Retention cohort matrix: cohort = first-activity week, counting "
    "distinct active users per (cohort_week, week_offset). Two "
    "aggregations and a join all keyed on user_id; the final count-"
    "distinct re-shuffles on the (tiny) cohort key only.",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cohort week as a whole-partition window min: ONE events scan and
    # ONE user_id shuffle (the aggregate-then-self-join form scanned
    # events twice — scan+project subtrees get no runtime exchange
    # reuse, unlike shared shuffles).
    ev = load_table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", (F.col("ts") / _WEEK_NS).cast("long").alias("week")
    )
    w = Window.partitionBy("user_id")
    return (
        weeks.withColumn("cohort_week", F.min("week").over(w))
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q_ohlc_bars",
    oracle=f"""
    SELECT user_id,
           (epoch_ns(ts) // {15 * _NS_PER_MIN}) * {15 * _NS_PER_MIN // 1000} AS bar_us,
           round(arg_min(value, epoch_ns(ts)::HUGEINT * 1000000 + event_id), 4) AS open,
           round(max(value), 4)  AS high,
           round(min(value), 4)  AS low,
           round(arg_max(value, epoch_ns(ts)::HUGEINT * 1000000 + event_id), 4) AS close,
           count(*)              AS n_ticks
    FROM events
    WHERE user_id < 20
    GROUP BY 1, 2
    """,
    doc="OHLC candlestick bars (15-minute): open/close via min_by/"
    "max_by on a (time, event_id) composite order key — deterministic "
    "under concurrent equal timestamps — high/low/count as plain "
    "aggregates. ONE hash aggregate with map-side partials; no window, "
    "no sort, no per-bar subquery: the shape that holds at 100 TB of "
    "tick data.",
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    bar_ns = 15 * _NS_PER_MIN
    # composite order key: ns_time * 1e6 + event_id in 128-bit ints
    # (decimal(38,0) here, HUGEINT in the oracle) — a plain long
    # overflows at epoch-ns scale — so equal-time ticks break ties
    # identically in both engines
    okey = F.col("ts").cast("decimal(38,0)") * 1_000_000 + F.col("event_id")
    return ev.groupBy(
        "user_id",
        F.expr(f"(ts div {bar_ns}) * {bar_ns // 1000}").alias("bar_us"),
    ).agg(
        F.round(F.min_by("value", okey), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max_by("value", okey), 4).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@register(
    "q_counter_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, value,
             lag(value)        OVER w AS prev_v,
             lag(epoch_ns(ts)) OVER w AS prev_ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_deltas,
           round(sum(CASE WHEN value >= prev_v THEN value - prev_v
                          ELSE value END), 4) AS total_increase,
           round(sum(CASE WHEN value >= prev_v THEN value - prev_v
                          ELSE value END)
                 / (greatest(max(ts_ns) - min(ts_ns), 1) / 1e9), 6)
             AS per_sec_rate
    FROM seq
    WHERE prev_ns IS NOT NULL
    GROUP BY user_id
    """,
    doc="Monotonic-counter rate with reset handling (the monitoring-"
    "TSDB `rate()` idiom): per key, a drop in the counter means a "
    "reset, so the increase is the new value itself; total increase / "
    "observed span = per-second rate. One lag window + one aggregate, "
    "both keyed on user_id — a single shuffle shared by both stages.",
)
def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lag("ts").over(w).alias("prev_ns"),
    ).where(F.col("prev_ns").isNotNull())
    inc = F.when(
        F.col("value") >= F.col("prev_v"), F.col("value") - F.col("prev_v")
    ).otherwise(F.col("value"))
    return seq.groupBy("user_id").agg(
        (F.count(F.lit(1))).cast("bigint").alias("n_deltas"),
        F.round(F.sum(inc), 4).alias("total_increase"),
        F.round(
            F.sum(inc)
            / (F.greatest(F.max("ts") - F.min("ts"), F.lit(1)) / F.lit(1e9)),
            6,
        ).alias("per_sec_rate"),
    )


@register(
    "q_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           (epoch_ns(p.ts) // 1000) AS purchase_us,
           (SELECT max(epoch_ns(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts
              AND epoch_ns(c.ts) >= epoch_ns(p.ts) - 1800000000000)
             // 1000 AS click_within_30m_us
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="Tolerance-bounded as-of join: latest preceding click within "
    "30 minutes, else NULL (merge_asof tolerance semantics — "
    "operators.temporal.asof_join's tolerance parameter). Same-source "
    "single-scan form: the tolerance IS the window frame — a "
    "RANGE BETWEEN 30min PRECEDING AND CURRENT ROW max over tagged "
    "click times; one scan, one user_id shuffle.",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tol_ns = 30 * 60 * 1_000_000_000
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-tol_ns, 0)
    )
    return (
        tagged.withColumn("last_click_ns", F.max("click_ts").over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.expr("ts div 1000").alias("purchase_us"),
            F.expr("last_click_ns div 1000").alias("click_within_30m_us"),
        )
    )


_QR_DAY_NS = 86_400_000_000_000
_QR_K = 16_384  # level-0 cap: sketch is exact whenever n <= k


@register(
    "q_quantile_rollup",
    oracle=f"""
    WITH buckets AS (
      SELECT epoch_ns(ts) // {_QR_DAY_NS} AS bucket,
             CAST(count(value) AS BIGINT) AS n,
             quantile_disc(value, 0.5) AS p50,
             quantile_disc(value, 0.9) AS p90,
             quantile_disc(value, 0.99) AS p99
      FROM events WHERE value IS NULL OR NOT isnan(value) GROUP BY 1
    ),
    total AS (
      SELECT CAST(-1 AS BIGINT) AS bucket,
             CAST(count(value) AS BIGINT) AS n,
             quantile_disc(value, 0.5) AS p50,
             quantile_disc(value, 0.9) AS p90,
             quantile_disc(value, 0.99) AS p99
      FROM events WHERE value IS NULL OR NOT isnan(value)
    ),
    unioned AS (SELECT * FROM buckets UNION ALL SELECT * FROM total)
    SELECT bucket, n,
           CASE WHEN n <= {_QR_K} THEN p50 END AS p50,
           CASE WHEN n <= {_QR_K} THEN p90 END AS p90,
           CASE WHEN n <= {_QR_K} THEN p99 END AS p99
    FROM unioned
    """,
    doc="Continuous quantile rollup over mergeable KLL sketches: one "
    "pass builds a per-day sketch of event values; any range query "
    "(here: the whole-history row, bucket = -1) merges sketch rows "
    "without rescanning raw data — the quantile counterpart of the "
    "HLL distinct rollup. Regime-aware oracle contract: whenever a "
    "row's n <= k (= 16384, the level-0 cap) no compaction fires, "
    "the sketch IS the sorted bucket, and estimates equal "
    "quantile_disc exactly; rows with n > k are in the approximate "
    "regime, so BOTH sides emit NULL quantiles there (at sf0.1 that "
    "is only the whole-history row: every day bucket stays exact and "
    "fully checked). The estimator's rank-error bound in the n > k "
    "regime is pinned separately in tests/test_sketch.py "
    "(test_kll_error_bound_and_merge) and the non-NULL approximate "
    "values are asserted against the bound in "
    "test_quantile_rollup_approx_regime_bound.",
)
def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators import sketch as SK

    ev = load_table(spark, sf_dir, "events")
    # NaN is un-measurable like NULL and must not rank into the
    # sketch (NaN placement differs cross-engine; the oracle filter
    # mirrors this — r14 fuzz, nan class)
    roll = SK.quantile_rollup(
        ev.where(F.col("value").isNotNull() & ~F.isnan("value")),
        "value",
        F.expr(f"ts div {_QR_DAY_NS}"),  # integer div: no double rounding
        k=_QR_K,
    )
    probs = (0.5, 0.9, 0.99)
    # driver-side fold over the BOUNDED sketch rows (one per day
    # bucket) — the raw events are read exactly once, inside
    # quantile_rollup's single bucket-keyed shuffle
    rows = roll.collect()
    from ella_spark.operators.sketch import kll_merge, kll_quantiles

    def gate(n: int, qs: list) -> list:
        # approximate regime (compaction fired): suppress to NULL so
        # the oracle stays hash-exact; the rank-error bound for these
        # rows is pinned in tests (see docstring).
        return qs if n <= _QR_K else [None, None, None]

    out = []
    merged: list = []
    total_n = 0
    for r in rows:
        levels = [list(l) for l in r.levels]
        n = int(r.n)
        out.append((int(r.bucket), n, *gate(n, kll_quantiles(levels, probs))))
        merged = kll_merge(merged, levels, _QR_K)
        total_n += n
    out.append((-1, total_n, *gate(total_n, kll_quantiles(merged, probs))))
    return spark.createDataFrame(
        out, "bucket bigint, n bigint, p50 double, p90 double, p99 double"
    )


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, value,
             lead(epoch_ns(ts)) OVER w AS next_ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           round(sum(value * (next_ns - ts_ns))
                 / greatest(max(next_ns) - min(ts_ns), 1), 6) AS twa,
           round(avg(value), 6) AS plain_avg
    FROM seq
    WHERE next_ns IS NOT NULL
    GROUP BY user_id
    """,
    doc="Time-weighted average with last-observation-carried-forward "
    "interpolation (the TimescaleDB `time_weight('LOCF')` idiom): "
    "each sample's value holds until the next sample, so irregularly "
    "spaced series average by TIME COVERED, not by sample count — a "
    "sensor that reports once an hour at 10.0 and once a second at "
    "0.0 has a plain avg near 0 but a TWA near 10. One lead window + "
    "one aggregate, both keyed on user_id — a single shuffle shared "
    "by both stages (same plan shape as q_counter_rate); at 100 TB "
    "the window sort rides the shuffle's partition ordering.",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("ts").alias("ts_ns"),
        "value",
        F.lead("ts").over(w).alias("next_ns"),
    ).where(F.col("next_ns").isNotNull())
    span = F.greatest(
        F.max("next_ns") - F.min("ts_ns"), F.lit(1)
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.round(
            F.sum(F.col("value") * (F.col("next_ns") - F.col("ts_ns"))) / span,
            6,
        ).alias("twa"),
        F.round(F.avg("value"), 6).alias("plain_avg"),
    )


@register(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT user_id, median(CAST(value AS DOUBLE)) AS med
      FROM events WHERE value IS NULL OR NOT isnan(value)
      GROUP BY user_id
    ),
    dev AS (
      SELECT e.user_id, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.user_id = e.user_id
      WHERE e.value IS NULL OR NOT isnan(e.value)
    ),
    mad AS (
      SELECT user_id, median(adev) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(max(d.med), 6) AS med,
           round(max(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN m.mad > 0 AND d.adev > 3 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON m.user_id = d.user_id
    GROUP BY d.user_id
    """,
    doc="Robust per-key anomaly detection via median absolute "
    "deviation (the MAD rule — resistant to the outliers it hunts, "
    "unlike mean/stddev z-scores): per key, median, MAD, and the "
    "count of samples beyond 3 MADs. Exact interpolated medians "
    "(Spark median == DuckDB quantile_cont at DOUBLE) make the flag "
    "deterministic cross-engine. Plan shape: two median aggregates "
    "and the final rollup all shuffle on user_id — AQE reuses the "
    "partitioning; nothing is per-row Python.",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drop NaN measurements (mirrored in the oracle): NaN ranks
    # into the two medians differently across engines — NULL rows
    # stay, as before, so n keeps its count(*) meaning (r14 fuzz)
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value")
        .where(F.col("value").isNull() | ~F.isnan("value"))
    )
    med = ev.groupBy("user_id").agg(
        F.median(F.col("value").cast("double")).alias("med")
    )
    dev = ev.join(med, "user_id").select(
        "user_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("user_id").agg(F.median("adev").alias("mad"))
    flag = F.when(
        (F.col("mad") > 0) & (F.col("adev") > 3 * F.col("mad")), 1
    ).otherwise(0)
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(flag).cast("bigint").alias("n_outliers"),
        )
    )


@register(
    "q_ewma",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE)
                  ORDER BY epoch_ns(ts), event_id) AS vs,
             count(*) AS n
      FROM events GROUP BY user_id)
    SELECT user_id, n,
           round(list_reduce(vs,
                 (acc, x) -> acc * 0.5 + x * 0.5), 6) AS ewma
    FROM seq
    ORDER BY user_id
    """,
    doc="Exponentially weighted moving average per key (the TSDB "
    "smoothing workhorse; alpha=1/2 so every weight is a power of two "
    "— EXACTLY representable in binary, and the fold is the identical "
    "IEEE op sequence in both engines, so the oracle hash-matches "
    "without estimator slop). EWMA is order-recursive (acc = acc/2 + "
    "x/2), inexpressible as a plain window aggregate: the portable "
    "form is an ordered per-key collect + one left fold, determinized "
    "by the (time, event_id) sort. At scale: one shuffle on the key; "
    "per-key state is the value sequence — for unbounded streams the "
    "same recurrence runs as a stateful streaming fold instead.",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select("user_id", "ts", "event_id", F.col("value").cast("double").alias("v"))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "v"))
            ).alias("rows"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "user_id",
            "n",
            F.transform(F.col("rows"), lambda r: r["v"]).alias("vs"),
        )
    )
    fold = F.aggregate(
        F.slice(F.col("vs"), 2, F.size(F.col("vs")) - 1),
        F.element_at(F.col("vs"), 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return (
        seq.where(F.size(F.col("vs")) > 0)
        .select("user_id", "n", F.round(fold, 6).alias("ewma"))
        .orderBy("user_id")
    )


@register(
    "q_m4_downsample",
    oracle="""
    WITH b AS (
      SELECT user_id,
             epoch_ns(ts) // 86400000000000 AS bkt,
             epoch_ns(ts) // 1000 AS ts_us,
             event_id, value
      FROM events
      WHERE value IS NOT NULL),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY user_id, bkt
                           ORDER BY ts_us, event_id) AS rf,
        row_number() OVER (PARTITION BY user_id, bkt
                           ORDER BY ts_us DESC, event_id DESC) AS rl,
        row_number() OVER (PARTITION BY user_id, bkt
                           ORDER BY value, ts_us, event_id) AS rmin,
        row_number() OVER (PARTITION BY user_id, bkt
                           ORDER BY value DESC, ts_us, event_id) AS rmax
      FROM b)
    SELECT user_id, bkt, ts_us, round(value, 6) AS v
    FROM r
    WHERE rf = 1 OR rl = 1 OR rmin = 1 OR rmax = 1
    ORDER BY user_id, bkt, ts_us, v
    """,
    doc="M4 downsampling (Jugel et al., VLDB'14): per series per time "
    "bucket keep exactly the first/last/min/max points — the "
    "error-free aggregation for line-chart rendering every TSDB "
    "visualization layer uses (Grafana/Timescale idiom). min_by/"
    "max_by declarative aggregates with map-side partials: the "
    "(series, bucket) exchange carries four point structs per bucket "
    "per mapper — O(buckets), never O(rows); deterministic "
    "tie-breaks by (time, event_id). Output is the union of the "
    "four extremal rows (a row can be several at once — emitted "
    "once).",
)
def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT four row_number windows over the raw rows: that form
    # shuffles EVERY event through the (series, bucket) exchange and
    # sorts each partition four times — and the 4-ordering
    # combination blocks Catalyst's WindowGroupLimit prune entirely
    # (a row pruned under one ordering may win another), so the
    # full-data sort is unavoidable in window form (r14 wave-4
    # screen). The same four extremal points fall out of min_by/
    # max_by declarative aggregates with map-side partial combine.
    # event_id rides inside the point struct so two DISTINCT events
    # that project to identical (ts_us, value) still emit as two
    # rows — exactly the window form's (and the oracle's) semantics
    # — while one row winning several criteria dedupes to one
    # (array_distinct).
    # un-measured points are not plottable and must not win an
    # extremal slot: both engines exclude NULL values (without the
    # mirrored filter, Spark's nulls-FIRST ascending sort elects a
    # NULL row as the bucket min while DuckDB's nulls-last does not —
    # r14 fuzz)
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
    pt = F.struct("ts_us", "event_id", "value")
    k_time = F.struct("ts_us", "event_id")  # first/last order
    k_min = F.struct("value", "ts_us", "event_id")  # min order
    # max order = value DESC, ts ASC, id ASC: negating the int64
    # tiebreakers lets ONE max_by struct key express the mixed
    # directions (max value, then min ts, then min id)
    k_max = F.struct(
        F.col("value"),
        (-F.col("ts_us")).alias("nts"),
        (-F.col("event_id")).alias("neid"),
    )
    return (
        b.groupBy("user_id", "bkt")
        .agg(
            F.min_by(pt, k_time).alias("p_f"),
            F.max_by(pt, k_time).alias("p_l"),
            F.min_by(pt, k_min).alias("p_min"),
            F.max_by(pt, k_max).alias("p_max"),
        )
        .select(
            "user_id",
            "bkt",
            F.explode(
                F.array_distinct(F.array("p_f", "p_l", "p_min", "p_max"))
            ).alias("p"),
        )
        .select(
            "user_id",
            "bkt",
            F.col("p.ts_us").alias("ts_us"),
            F.round(F.col("p.value"), 6).alias("v"),
        )
        .orderBy("user_id", "bkt", "ts_us", "v")
    )


# ── round-7 additions ────────────────────────────────────────────────


@register(
    "q_interpolate_linear",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // {10 * _NS_PER_MIN} AS b, value, event_id
      FROM events WHERE user_id < 5),
    binned AS (
      SELECT user_id, b, max_by(value, event_id) AS v
      FROM e GROUP BY user_id, b),
    bounds AS (
      SELECT user_id, min(b) AS lo, max(b) AS hi FROM binned GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(range(lo, hi + 1)) AS b FROM bounds),
    j AS (
      SELECT g.user_id, g.b, binned.v
      FROM grid g LEFT JOIN binned ON g.user_id = binned.user_id AND g.b = binned.b),
    ctx AS (
      SELECT user_id, b, v,
             last_value(CASE WHEN v IS NOT NULL THEN
                 CAST(floor(v * 100 + 0.5) AS BIGINT) END IGNORE NULLS)
               OVER w_prec AS pc,
             last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER w_prec AS pb,
             first_value(CASE WHEN v IS NOT NULL THEN
                 CAST(floor(v * 100 + 0.5) AS BIGINT) END IGNORE NULLS)
               OVER w_foll AS nc,
             first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER w_foll AS nb
      FROM j
      WINDOW
        w_prec AS (PARTITION BY user_id ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_foll AS (PARTITION BY user_id ORDER BY b
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id,
           b * {10 * _NS_PER_MIN // 1000} AS bucket_us,
           CAST(CASE
             WHEN v IS NOT NULL THEN CAST(floor(v * 100 + 0.5) AS BIGINT)
             WHEN pc IS NOT NULL AND nc IS NOT NULL THEN
               (pc * (nb - b) + nc * (b - pb)) // (nb - pb)
             WHEN pc IS NOT NULL THEN pc
             ELSE nc
           END AS DOUBLE) / 100 AS v_interp
    FROM ctx
    """,
    doc="Linear interpolation onto a fixed 10-minute grid — the TSDB "
    "interpolate() companion to q_gap_fill's forward fill. Missing "
    "buckets take the exact-rational lerp (pc*(nb-b) + nc*(b-pb)) "
    "div (nb-pb) from the nearest known neighbors, carried in "
    "integer CENTI-units (events.value is 2-decimal; values are "
    "non-negative so floor==trunc) — a double lerp lands on "
    ".xxx5 rounding ties where Spark (shortest-repr HALF_UP) and "
    "DuckDB (binary-value rounding) legally disagree. Two "
    "mirror-image IGNORE NULLS windows over the SAME user_id "
    "partitioning: one shuffle; leading/trailing gaps degrade to "
    "nearest-known.",
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    bin_ns = 10 * _NS_PER_MIN
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 5)
    binned = ev.groupBy(
        "user_id", F.expr(f"ts div {bin_ns}").alias("b")
    ).agg(F.max_by("value", "event_id").alias("v"))
    grid = (
        binned.groupBy("user_id")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("b"),
        )
    )
    j = grid.join(binned, ["user_id", "b"], "left")
    w_prec = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_foll = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_b = F.when(F.col("v").isNotNull(), F.col("b"))
    # integer centi-units: exact lerp, no double-rounding tie traps
    centi = F.when(
        F.col("v").isNotNull(),
        F.floor(F.col("v") * 100 + 0.5).cast("bigint"),
    )
    pc = F.last(centi, ignorenulls=True).over(w_prec)
    pb = F.last(known_b, ignorenulls=True).over(w_prec)
    nc = F.first(centi, ignorenulls=True).over(w_foll)
    nb = F.first(known_b, ignorenulls=True).over(w_foll)
    b = F.col("b")
    ctx = j.withColumns(
        {"_pc": pc, "_pb": pb, "_nc": nc, "_nb": nb}
    )
    interp_centi = (
        F.when(
            F.col("v").isNotNull(),
            F.floor(F.col("v") * 100 + 0.5).cast("bigint"),
        )
        .when(
            F.col("_pc").isNotNull() & F.col("_nc").isNotNull(),
            F.expr("(_pc * (_nb - b) + _nc * (b - _pb)) div (_nb - _pb)"),
        )
        .when(F.col("_pc").isNotNull(), F.col("_pc"))
        .otherwise(F.col("_nc"))
    )
    return ctx.select(
        "user_id",
        (b * (bin_ns // 1000)).alias("bucket_us"),
        (interp_centi.cast("double") / 100).alias("v_interp"),
    )


@register(
    "q_sessionize_stats",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, value,
             lag(epoch_ns(ts)) OVER w AS prev_ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
    marked AS (
      SELECT *, CASE WHEN prev_ns IS NULL
                       OR ts_ns - prev_ns > {30 * _NS_PER_MIN} THEN 1
                     ELSE 0 END AS is_new
      FROM seq),
    sess AS (
      SELECT user_id, ts_ns, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM marked)
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts_ns) // 1000 AS start_us,
           (max(ts_ns) - min(ts_ns)) // 1000 AS duration_us,
           CAST(round(sum(CAST(value AS DECIMAL(28,8))), 2) AS DOUBLE)
             AS value_sum
    FROM sess
    GROUP BY user_id, session_seq
    """,
    doc="Full sessionization: 30-min-inactivity session IDs assigned "
    "by a cumulative sum of session-start flags, then per-session "
    "stats (count, start, duration, decimal-exact value sum). The "
    "lag, the running sum, AND the final aggregate all share ONE "
    "user_id partitioning — Catalyst plans a single shuffle; "
    "q_session_gaps only counts sessions, this materializes them.",
)
def q_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap_ns = 30 * _NS_PER_MIN
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts") - F.lag("ts").over(w)) > gap_ns),
        1,
    ).otherwise(0)
    sess = ev.withColumn("session_seq", F.sum(is_new).over(wc))
    return sess.groupBy(
        "user_id", F.col("session_seq").cast("bigint").alias("session_seq")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("min(ts) div 1000").alias("start_us"),
        F.expr("(max(ts) - min(ts)) div 1000").alias("duration_us"),
        F.round(F.sum(F.col("value").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("value_sum"),
    )


@register(
    "q_cumulative_distinct",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, min(epoch_ns(ts) // {24 * 3600 * _NS_PER_SEC}) AS day
      FROM events GROUP BY user_id),
    daily AS (
      SELECT day, count(*) AS new_users FROM first_seen GROUP BY day)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
    """,
    doc="Cumulative distinct-user count by day via the first-occurrence "
    "identity: COUNT(DISTINCT) over a growing window is quadratic, "
    "but min-day-per-user + daily counts + one running sum is two "
    "keyed aggregations and an O(days) window — the scalable form of "
    "'cumulative uniques', exact at any scale.",
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    day_ns = 24 * 3600 * _NS_PER_SEC
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.expr(f"min(ts div {day_ns})").alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ns(ts), event_id)
               AS prev_type
      FROM events)
    SELECT prev_type AS from_type, event_type AS to_type,
           count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    doc="Event-type transition matrix (per-user Markov bigrams): lag "
    "window + group count. One user_id shuffle for the lag, one "
    "transition-pair shuffle for the count — the funnel-adjacent "
    "'what happens after X' product-analytics primitive.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_first_touch_attribution",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events),
    first_touch AS (
      SELECT user_id, event_type AS first_type FROM ranked WHERE rn = 1),
    conv AS (
      SELECT user_id, count(*) FILTER (WHERE event_type = 'purchase')
               AS purchases
      FROM events GROUP BY user_id)
    SELECT f.first_type,
           count(*) AS n_users,
           CAST(sum(c.purchases) AS BIGINT) AS n_purchases
    FROM first_touch f JOIN conv c ON c.user_id = f.user_id
    GROUP BY f.first_type
    """,
    doc="First-touch attribution: each user's FIRST event type "
    "(row_number window, deterministic (ts, event_id) order) credited "
    "with their later purchase count. The window and the per-user "
    "conversion aggregate share the user_id partitioning; the final "
    "rollup groups a user-sized frame by first_type.",
)
def q_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_touch = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_type"))
    )
    conv = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "purchases"
        )
    )
    return (
        first_touch.join(conv, "user_id")
        .groupBy("first_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("purchases").cast("bigint").alias("n_purchases"),
        )
    )


@register(
    "q_rolling_zscore",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events),
    w AS (
      SELECT user_id, event_id, ts_ns, value,
             vc,
             count(*) OVER win AS n,
             sum(vc) OVER win AS s,
             sum(vc * vc) OVER win AS sq
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts_ns
                     RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           (value - CAST(s AS DOUBLE) / (100 * n))
             / sqrt(CAST(n * sq - s * s AS DOUBLE) / (10000.0 * n * (n - 1)))
             AS z
    FROM w
    WHERE n >= 3 AND n * sq > s * s
    """,
    doc="Rolling 1-hour z-score per key (anomaly detection): count / "
    "sum / sum-of-squares over ONE RANGE event-time window, carried "
    "as exact int64 centi-units (sum <= 5.6e8, n*sq <= ~5e16 — no "
    "overflow, no float accumulation-order drift), then mean/std/z "
    "derived in a fixed sequence of correctly-rounded double ops "
    "(div, sub, sqrt — all IEEE-deterministic, no in-query rounding). "
    "Ties in ts are RANGE peers on both engines. Emitted unrounded: "
    "bit-identical doubles cross-engine. The n >= 3 gate (sample "
    "variance needs n >= 2; 3 keeps the estimate non-degenerate) "
    "fires on the driver testdata — 31 rows at sf0.01, ~427 at "
    "sf0.1 — so the parity check exercises real values.",
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("ts_ns"),
        "value",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rangeBetween(-3600 * _NS_PER_SEC, 0)
    )
    w = c.withColumns(
        {
            "n": F.count(F.lit(1)).over(win),
            "s": F.sum("vc").over(win),
            "sq": F.sum(F.col("vc") * F.col("vc")).over(win),
        }
    )
    n, s, sq = F.col("n"), F.col("s"), F.col("sq")
    mean = s.cast("double") / (100 * n)
    var = (n * sq - s * s).cast("double") / (
        F.lit(10000.0) * n * (n - 1)
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return w.where((n >= 3) & (n * sq > s * s)).select(
        "user_id", "event_id", z.alias("z")
    )


@register(
    "q_seasonal_baseline",
    oracle="""
    WITH e AS (
      SELECT event_type,
             (epoch_ns(ts) // 3600000000000) % 24 AS hour,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    g AS (
      SELECT event_type, hour, sum(cents) AS s, count(*) AS c
      FROM e GROUP BY event_type, hour),
    d AS (
      SELECT e.event_type, e.hour,
             abs(CAST(e.cents AS DOUBLE) - CAST(g.s AS DOUBLE) / g.c) AS dev
      FROM e JOIN g ON g.event_type IS NOT DISTINCT FROM e.event_type AND g.hour = e.hour)
    SELECT g.event_type, CAST(g.hour AS INT) AS hour, g.c AS n,
           CAST(g.s AS DOUBLE) / (g.c * 100) AS mean_value,
           max(d.dev) / 100 AS max_dev_value
    FROM g JOIN d ON d.event_type IS NOT DISTINCT FROM g.event_type AND d.hour = g.hour
    GROUP BY g.event_type, g.hour, g.c, g.s
    ORDER BY g.event_type, hour
    """,
    doc="Seasonal (hour-of-day) baseline profile + worst residual per "
    "(event_type, hour): the seasonal-anomaly companion to "
    "q_rolling_zscore (global periodic profile vs trailing window). "
    "Single-scan, SINGLE-SHUFFLE plan: the per-group mean is a "
    "whole-partition window over the (event_type, hour) key and the "
    "residual max reuses the same partitioning — no profile re-join, "
    "no second scan. Exactness: values in int64 cents, mean = one "
    "double division of exact ints, residual = one subtraction — "
    "every float op correctly rounded and order-independent, so the "
    "DuckDB oracle (spelled as the equivalent join) hash-matches.",
)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.expr("(ts div 3600000000000) % 24").cast("int").alias("hour"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("event_type", "hour")
    d = e.withColumns(
        {"s": F.sum("cents").over(w), "c": F.count(F.lit(1)).over(w)}
    ).withColumn(
        "dev",
        F.abs(
            F.col("cents").cast("double")
            - F.col("s").cast("double") / F.col("c")
        ),
    )
    return (
        d.groupBy("event_type", "hour")
        .agg(
            F.max("c").alias("n"),
            (F.max("s").cast("double") / (F.max("c") * 100)).alias("mean_value"),
            (F.max("dev") / 100).alias("max_dev_value"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "q_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
    g AS (
      SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY e1, e2, e3)
    SELECT e1, e2, e3, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS share
    FROM g
    ORDER BY n DESC, e1, e2, e3
    LIMIT 20
    """,
    doc="Top-20 per-user event-type trigrams (behavioral 3-gram "
    "census with corpus share): two lead() taps on ONE user-ordered "
    "window — the same single user_id shuffle as the transition "
    "matrix, extended to third-order sequences ('what three-step "
    "paths dominate') — then a trigram-keyed count. The share "
    "denominator is a whole-partition window over the aggregated "
    "<= |types|^3 frame. Deterministic (ts, event_id) ordering and "
    "(n DESC, trigram) tie-break.",
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    g = seq.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("n"))
    share = F.round(
        F.col("n").cast("double") / F.sum("n").over(Window.partitionBy()), 6
    )
    return (
        g.withColumn("share", share)
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(20)
    )


_CUSUM_DAY_NS = 86_400_000_000_000


@register(
    "q_changepoint_cusum",
    oracle=f"""
    WITH c AS (
      SELECT event_type, epoch_ns(ts) // {_CUSUM_DAY_NS} AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    d AS (
      SELECT event_type, day,
             CAST(sum(vc) AS BIGINT) AS s_d,
             CAST(count(*) AS BIGINT) AS c_d
      FROM c GROUP BY event_type, day),
    t AS (
      SELECT event_type,
             CAST(sum(s_d) AS BIGINT) AS s_tot,
             CAST(sum(c_d) AS BIGINT) AS c_tot
      FROM d GROUP BY event_type),
    w AS (
      SELECT d.event_type, d.day,
             sum(d.s_d) OVER win AS cs,
             sum(d.c_d) OVER win AS cc,
             t.s_tot, t.c_tot
      FROM d JOIN t ON t.event_type IS NOT DISTINCT FROM d.event_type
      WINDOW win AS (PARTITION BY d.event_type ORDER BY d.day)),
    k AS (
      SELECT event_type, day,
             abs(CAST(cs AS DOUBLE)
                 - CAST(s_tot AS DOUBLE) * cc / c_tot) / 100.0 AS w_abs
      FROM w),
    r AS (
      SELECT event_type, day, w_abs,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY w_abs DESC, day) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_days
      FROM k)
    SELECT event_type, CAST(day AS BIGINT) AS cp_day, n_days,
           round(w_abs, 6) AS cusum_max
    FROM r WHERE rn = 1 ORDER BY event_type
    """,
    doc="CUSUM changepoint detection per event_type over the daily "
    "value series — 'when did this slice's level shift?', the "
    "ingest-monitoring primitive that localizes drift in TIME (PSI/"
    "KS/chi² say whether a slice moved; CUSUM says when). The "
    "classic statistic W_d = sum_{i<=d}(x_i − x̄) over individual "
    "observations regroups exactly by day as cumsum(s_d) − "
    "x̄·cumsum(c_d), so daily int64 centi-unit sums/counts carry it "
    "exactly; the changepoint is argmax_d |W_d| (min day on ties via "
    "the (w_abs DESC, day) rank). The only double ops are one "
    "product and one division on already-aggregated totals — at "
    "100 TB stratum scale the int64 product s_tot*cc would wrap, so "
    "it is computed in double (the q_neyman_allocation contract); "
    "same IEEE sequence both engines. Plan: ONE (type, day) groupBy "
    "shuffle over the scan; every window runs on the O(types×days) "
    "aggregated frame.",
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr(f"ts div {_CUSUM_DAY_NS}").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    d = c.groupBy("event_type", "day").agg(
        F.sum("vc").alias("s_d"), F.count(F.lit(1)).alias("c_d")
    )
    # totals via whole-partition windows over the SAME type keying the
    # cumulative frames use (the q_psi_drift pattern): one scan, one
    # type-keyed exchange — a separate groupBy + join would replay the
    # events scan a second time
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt_all = Window.partitionBy("event_type")
    w = d.withColumns(
        {
            "cs": F.sum("s_d").over(win),
            "cc": F.sum("c_d").over(win),
            "s_tot": F.sum("s_d").over(wt_all),
            "c_tot": F.sum("c_d").over(wt_all),
        }
    )
    w_abs = (
        F.abs(
            F.col("cs").cast("double")
            - F.col("s_tot").cast("double") * F.col("cc") / F.col("c_tot")
        )
        / 100.0
    )
    k = w.select("event_type", "day", w_abs.alias("w_abs"))
    wt = Window.partitionBy("event_type")
    r = k.select(
        "event_type",
        "day",
        "w_abs",
        F.row_number()
        .over(wt.orderBy(F.col("w_abs").desc(), "day"))
        .alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n_days"),
    )
    return (
        r.where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            "n_days",
            F.round("w_abs", 6).alias("cusum_max"),
        )
        .orderBy("event_type")
    )


_PH_LAMBDA = 100.0


@register(
    "q_page_hinkley",
    oracle=f"""
    WITH c AS (
      SELECT event_type, epoch_ns(ts) AS tns, event_id, value
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT event_type,
             row_number() OVER win AS rn,
             sum(value) OVER win AS cs
      FROM c
      WINDOW win AS (PARTITION BY event_type ORDER BY tns, event_id)),
    m AS (
      SELECT event_type, rn,
             cs - sum(cs / rn) OVER win2 AS m
      FROM w
      WINDOW win2 AS (PARTITION BY event_type ORDER BY rn)),
    g AS (
      SELECT event_type,
             CAST(max(rn) AS BIGINT) AS n,
             round(max_by(m, rn) - least(min(m), 0.0), 6) AS ph_up,
             round(greatest(max(m), 0.0) - max_by(m, rn), 6) AS ph_down
      FROM m GROUP BY event_type)
    SELECT event_type, n, ph_up, ph_down,
           ph_up > {_PH_LAMBDA} AS alarm_up,
           ph_down > {_PH_LAMBDA} AS alarm_down
    FROM g ORDER BY event_type
    """,
    doc="Batch Page-Hinkley mean-shift statistic per event_type — the "
    "replayable form of the streaming page_hinkley_per_group detector "
    "(streaming/stateful.py), sharing its recurrence exactly: "
    "m_t = Σx_i − Σ_i prefix_mean(i) (δ=0), ph_up = m_T − min(0, m), "
    "ph_down = max(0, m) − m_T (the 0 is the detector's initial "
    "excursion state). The sequential recurrence is SQL-expressible "
    "as a cumulative of a cumulative: cs_t = running sum, then "
    "m_t = cs_t − running_sum(cs_i / i) — TWO ordered window passes "
    "over ONE (type)-keyed shuffle, both engines accumulating doubles "
    "in identical frame order; alarms are derived from the round(6) "
    "values so boundary ulps cannot flip a boolean. At 100 TB the "
    "ordered windows ride the type shuffle's partition sort — the "
    "same single-shuffle shape as q_rolling_zscore.",
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type", F.col("ts").alias("tns"), "event_id", "value"
    )
    win = Window.partitionBy("event_type").orderBy("tns", "event_id")
    w = c.select(
        "event_type",
        F.row_number().over(win).alias("rn"),
        F.sum("value").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
    )
    win2 = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = w.select(
        "event_type",
        "rn",
        (F.col("cs") - F.sum(F.col("cs") / F.col("rn")).over(win2)).alias("m"),
    )
    g = m.groupBy("event_type").agg(
        F.max("rn").cast("bigint").alias("n"),
        F.round(
            F.expr("max_by(m, rn)") - F.least(F.min("m"), F.lit(0.0)), 6
        ).alias("ph_up"),
        F.round(
            F.greatest(F.max("m"), F.lit(0.0)) - F.expr("max_by(m, rn)"), 6
        ).alias("ph_down"),
    )
    return g.select(
        "event_type",
        "n",
        "ph_up",
        "ph_down",
        (F.col("ph_up") > _PH_LAMBDA).alias("alarm_up"),
        (F.col("ph_down") > _PH_LAMBDA).alias("alarm_down"),
    ).orderBy("event_type")


@register(
    "q_autocorrelation",
    oracle=f"""
    WITH c AS (
      SELECT event_type, epoch_ns(ts) // {_CUSUM_DAY_NS} AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    d AS (
      SELECT event_type, day,
             CAST(sum(vc) AS DOUBLE) / (100.0 * count(*)) AS m
      FROM c GROUP BY event_type, day),
    l AS (
      SELECT event_type, day, m,
             lead(m, 1) OVER win AS m1,
             lead(m, 2) OVER win AS m2,
             lead(m, 3) OVER win AS m3
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(m, m1), 6) AS acf1,
           round(corr(m, m2), 6) AS acf2,
           round(corr(m, m3), 6) AS acf3
    FROM l GROUP BY event_type ORDER BY event_type
    """,
    doc="Daily-series autocorrelation (lags 1-3) per event_type — the "
    "seasonality/persistence diagnostic next to q_seasonal_baseline "
    "(which assumes a 24 h cycle; ACF measures whether and at what "
    "lag memory actually exists, and a high lag-k ACF is what "
    "justifies per-key incremental state like EWMA at all). Daily "
    "means derive from exact int64 centi-unit sums (one (type, day) "
    "groupBy shuffle); the lag alignment is lead() over the "
    "O(types × days) aggregated frame (no self-join), and corr() is "
    "the same cross-engine-proven aggregate as q_corr_covar. "
    "round(6) absorbs accumulation ulps. 100 TB: one scan + one "
    "keyed shuffle; everything after runs on the bounded daily "
    "frame.",
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr(f"ts div {_CUSUM_DAY_NS}").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    d = c.groupBy("event_type", "day").agg(
        (
            F.sum("vc").cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)))
        ).alias("m")
    )
    win = Window.partitionBy("event_type").orderBy("day")
    lagged = d.withColumns(
        {
            "m1": F.lead("m", 1).over(win),
            "m2": F.lead("m", 2).over(win),
            "m3": F.lead("m", 3).over(win),
        }
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("m", "m1"), 6).alias("acf1"),
            F.round(F.corr("m", "m2"), 6).alias("acf2"),
            F.round(F.corr("m", "m3"), 6).alias("acf3"),
        )
        .orderBy("event_type")
    )


@register(
    "q_trend_robust",
    oracle=f"""
    WITH c AS (
      SELECT event_type, epoch_ns(ts) // {_CUSUM_DAY_NS} AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    d AS (
      SELECT event_type, day,
             CAST(sum(vc) AS BIGINT) AS s_d,
             CAST(count(*) AS BIGINT) AS c_d
      FROM c GROUP BY event_type, day),
    p AS (
      SELECT a.event_type,
             CASE WHEN CAST(b.s_d AS DECIMAL(19,0)) * a.c_d
                       > CAST(a.s_d AS DECIMAL(19,0)) * b.c_d THEN 1
                  WHEN CAST(b.s_d AS DECIMAL(19,0)) * a.c_d
                       < CAST(a.s_d AS DECIMAL(19,0)) * b.c_d THEN -1
                  ELSE 0 END AS sgn,
             (CAST(b.s_d AS DOUBLE) / (100.0 * b.c_d)
              - CAST(a.s_d AS DOUBLE) / (100.0 * a.c_d))
               / (b.day - a.day) AS slope
      FROM d a JOIN d b
        ON b.event_type = a.event_type AND b.day > a.day)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(sgn) AS BIGINT) AS mk_s,
           round(median(slope), 6) AS sen_slope
    FROM p GROUP BY event_type ORDER BY event_type
    """,
    doc="Robust trend per event_type over the daily mean series: the "
    "Mann-Kendall S statistic (Σ sign(x_j − x_i) over ordered day "
    "pairs — EXACT integers: the sign of mean_b − mean_a is decided "
    "by the cross-multiplied centi-unit sums s_b·c_a vs s_a·c_b in "
    "DECIMAL(38,0) — exact to 1e38, where int64 would wrap silently "
    "past 2^63; no float comparison anywhere) and the Theil-Sen slope "
    "(median of pairwise slopes — the estimator a single outlier day "
    "cannot move, unlike regr_slope). The pairwise join is over the "
    "ALREADY-AGGREGATED O(types × days) frame, so pairs are "
    "types × days²/2 — bounded by the calendar, not the row count "
    "(30 days → 435 pairs/type at ANY scale factor; for multi-year "
    "spans bucket to weeks first). One (type, day) groupBy shuffle "
    "over the scan; median parity is the q_weighted_median-proven "
    "aggregate; round(6) absorbs interpolation ulps.",
)
def q_trend_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr(f"ts div {_CUSUM_DAY_NS}").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    d = c.groupBy("event_type", "day").agg(
        F.sum("vc").alias("s_d"), F.count(F.lit(1)).alias("c_d")
    )
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    )
    # DECIMAL(19,0) x DECIMAL(19,0) -> DECIMAL(38,0): the cross
    # product stays EXACT to 1e38 (int64 x int64 would wrap silently
    # past 2^63 ~ 9.2e18 — reachable at ~1e12 centi-sum x 1e7 rows/day
    # — while DuckDB raises; decimal keeps both engines exact & agreed)
    cross_b = F.col("b.s_d").cast("decimal(19,0)") * F.col("a.c_d")
    cross_a = F.col("a.s_d").cast("decimal(19,0)") * F.col("b.c_d")
    sgn = (
        F.when(cross_b > cross_a, 1)
        .when(cross_b < cross_a, -1)
        .otherwise(0)
    )
    slope = (
        F.col("b.s_d").cast("double") / (F.lit(100.0) * F.col("b.c_d"))
        - F.col("a.s_d").cast("double") / (F.lit(100.0) * F.col("a.c_d"))
    ) / (F.col("b.day") - F.col("a.day"))
    p = pairs.select(
        F.col("a.event_type").alias("event_type"),
        sgn.alias("sgn"),
        slope.alias("slope"),
    )
    return (
        p.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("sgn").cast("bigint").alias("mk_s"),
            F.round(F.median("slope"), 6).alias("sen_slope"),
        )
        .orderBy("event_type")
    )


@register(
    "q_burstiness",
    oracle="""
    WITH c AS (
      SELECT event_type, epoch_ns(ts) AS tns, event_id
      FROM events),
    g AS (
      SELECT event_type,
             CAST(lead(tns) OVER win - tns AS DOUBLE) / 1e9 AS gap_s
      FROM c
      WINDOW win AS (PARTITION BY event_type ORDER BY tns, event_id)),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             avg(gap_s) AS mu,
             stddev_samp(gap_s) AS sigma
      FROM g WHERE gap_s IS NOT NULL
      GROUP BY event_type)
    SELECT event_type, n_gaps,
           round(mu, 6) AS mean_gap_s,
           round(sigma / mu, 6) AS cv,
           round((sigma - mu) / (sigma + mu), 6) AS burstiness
    FROM s WHERE n_gaps >= 2 AND mu > 0 ORDER BY event_type
    """,
    doc="Inter-arrival burstiness per event_type (Goh & Barabási "
    "2008): over the gaps between consecutive events, "
    "B = (σ−μ)/(σ+μ) ∈ (−1, 1) — B ≈ −1 for a metronome (σ→0), "
    "B = 0 for a Poisson process (σ = μ, the exponential's CV = 1), "
    "B → 1 for extreme burst-and-silence traffic. The capacity-"
    "planning diagnostic for ingest: a bursty slice needs peak "
    "provisioning / smoothing that its mean rate hides; CV is "
    "emitted alongside as the classic dispersion measure. One "
    "lead() window and one aggregate, both keyed on event_type — a "
    "single shuffle shared by both stages (the q_counter_rate / "
    "q_time_weighted_avg plan shape); gaps derive from exact int64 "
    "ns differences before the one division, and avg/stddev_samp "
    "parity is the q_agg_stats-proven aggregate pair. round(6) "
    "absorbs accumulation ulps. The mu > 0 gate (mirroring the "
    "n_gaps >= 2 gate) excludes all-duplicate-timestamp slices, "
    "where sigma/mu is 0/0 — NULL in non-ANSI Spark but NaN/error "
    "in DuckDB, a cross-engine hash-parity edge (r9 ADVICE). "
    "100 TB: the window sort rides the type shuffle's partition "
    "ordering.",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", F.col("ts").alias("tns"), "event_id")
    win = Window.partitionBy("event_type").orderBy("tns", "event_id")
    g = c.select(
        "event_type",
        ((F.lead("tns").over(win) - F.col("tns")).cast("double") / 1e9).alias(
            "gap_s"
        ),
    )
    s = (
        g.where(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.avg("gap_s").alias("mu"),
            F.stddev_samp("gap_s").alias("sigma"),
        )
    )
    mu, sigma = F.col("mu"), F.col("sigma")
    return (
        s.where((F.col("n_gaps") >= 2) & (mu > 0))
        .select(
            "event_type",
            "n_gaps",
            F.round(mu, 6).alias("mean_gap_s"),
            F.round(sigma / mu, 6).alias("cv"),
            F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
        )
        .orderBy("event_type")
    )


@register(
    "q_runs_test",
    oracle="""
    WITH c AS (
      SELECT event_type, epoch_ns(ts) AS tns, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT event_type, tns, event_id, vc,
             CAST(count(*) OVER win AS HUGEINT) AS n_t,
             CAST(sum(vc) OVER win AS HUGEINT) AS s_t
      FROM c WINDOW win AS (PARTITION BY event_type)),
    s AS (
      SELECT event_type, tns, event_id,
             CASE WHEN n_t * vc > s_t THEN 1
                  WHEN n_t * vc < s_t THEN 0 END AS sgn
      FROM w),
    f AS (
      SELECT event_type, sgn,
             CASE WHEN lag(sgn) OVER win IS NULL THEN 1
                  WHEN sgn <> lag(sgn) OVER win THEN 1 ELSE 0 END AS chg
      FROM s WHERE sgn IS NOT NULL
      WINDOW win AS (PARTITION BY event_type ORDER BY tns, event_id)),
    t AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(sgn) AS BIGINT) AS n1,
             CAST(count(*) - sum(sgn) AS BIGINT) AS n0,
             CAST(sum(chg) AS BIGINT) AS n_runs
      FROM f GROUP BY event_type)
    SELECT event_type, n, n1, n0, n_runs,
           round((n_runs - (1.0 + 2.0 * n1 * n0 / n))
                 / sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z_runs
    FROM t WHERE n1 >= 2 AND n0 >= 2 ORDER BY event_type
    """,
    doc="Wald–Wolfowitz runs test per event_type: the time-ordered "
    "sequence of above/below-mean indicators is reduced to its run "
    "count R and studentized — z << 0 means values CLUMP (long "
    "same-side streaks: regime persistence, stuck sensors, batched "
    "writes masquerading as live traffic), z >> 0 means oscillation "
    "faster than chance; the randomness audit that mean/variance "
    "monitors are blind to. Above/below is decided by the EXACT "
    "cross product n_t·vc vs s_t (no float mean, no ulp edge), "
    "carried in DECIMAL(38,0) / HUGEINT on the two engines — int64 "
    "would wrap silently past 2^63 ~ 9.2e18, reachable at ~1e12 "
    "rows/slice x 1e7 centi-magnitude (the q_levene_variance bound); "
    "decimal is exact to 1e38. "
    "Exact-mean rows drop symmetrically (standard tie handling). "
    "μ_R = 1 + 2n₁n₀/n and σ²_R's big products are computed in "
    "DOUBLE (int64 would wrap at (2n₁n₀)² for n > ~3e9 rows/slice). "
    "ONE event_type-keyed shuffle: totals via whole-partition "
    "windows, the lag() ordering and final agg ride the same "
    "keying. n₁, n₀ >= 2 gates σ > 0. round(6).",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.col("ts").alias("tns"),
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    w_all = Window.partitionBy("event_type")
    # DECIMAL(38,0) for the window sum AND the n_t*vc cross product:
    # exact to 1e38 where int64 wraps silently past 2^63 (~1e12
    # rows/slice x 1e7 centi-magnitude) — the oracle carries HUGEINT
    w = c.withColumns(
        {
            "n_t": F.count(F.lit(1)).over(w_all).cast("decimal(38,0)"),
            "s_t": F.sum(F.col("vc").cast("decimal(38,0)")).over(w_all),
        }
    )
    prod = F.col("n_t") * F.col("vc")
    s = w.select(
        "event_type",
        "tns",
        "event_id",
        F.when(prod > F.col("s_t"), 1)
        .when(prod < F.col("s_t"), 0)
        .alias("sgn"),
    ).where(F.col("sgn").isNotNull())
    w_ord = Window.partitionBy("event_type").orderBy("tns", "event_id")
    f = s.select(
        "event_type",
        "sgn",
        F.when(F.lag("sgn").over(w_ord).isNull(), 1)
        .when(F.col("sgn") != F.lag("sgn").over(w_ord), 1)
        .otherwise(0)
        .alias("chg"),
    )
    t = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("sgn").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("sgn")).cast("long").alias("n0"),
        F.sum("chg").cast("long").alias("n_runs"),
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
            "event_type",
            "n",
            "n1",
            "n0",
            "n_runs",
            F.round((F.col("n_runs") - mu) / F.sqrt(var), 6).alias("z_runs"),
        )
        .orderBy("event_type")
    )


@register(
    "q_gap_percentiles",
    oracle="""
    WITH c AS (
      SELECT event_type, epoch_ns(ts) AS tns, event_id
      FROM events),
    g AS (
      SELECT event_type,
             lead(tns) OVER win - tns AS gap_ns
      FROM c
      WINDOW win AS (PARTITION BY event_type ORDER BY tns, event_id)),
    t AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             quantile_cont(gap_ns, 0.5) AS p50,
             quantile_cont(gap_ns, 0.9) AS p90,
             quantile_cont(gap_ns, 0.99) AS p99
      FROM g WHERE gap_ns IS NOT NULL GROUP BY event_type)
    SELECT event_type, n_gaps,
           round(p50 / 1e9, 6) AS p50_gap_s,
           round(p90 / 1e9, 6) AS p90_gap_s,
           round(p99 / 1e9, 6) AS p99_gap_s
    FROM t WHERE n_gaps >= 2 ORDER BY event_type
    """,
    doc="Inter-arrival gap percentiles (p50/p90/p99) per event_type — "
    "the TAIL-latency companion of q_burstiness (whose B/CV compress "
    "the whole gap distribution to two moments): p99 gap is the SLA "
    "number a freshness monitor alarms on, and p99/p50 is the "
    "burst-to-baseline ratio capacity planning provisions for. Gaps "
    "derive from exact int64 ns lead() differences on the one "
    "event_type-keyed shuffle (the q_burstiness window); "
    "percentile() over exact int64 multisets interpolates "
    "deterministically (the q_percentile_exact-proven parity pair "
    "with quantile_cont), and /1e9 + round(6) converts to seconds "
    "identically on both engines. 100 TB: single keyed shuffle; the "
    "exact sort is per-type within the shuffle's partition ordering.",
)
def q_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", F.col("ts").alias("tns"), "event_id")
    win = Window.partitionBy("event_type").orderBy("tns", "event_id")
    g = c.select(
        "event_type",
        (F.lead("tns").over(win) - F.col("tns")).alias("gap_ns"),
    ).where(F.col("gap_ns").isNotNull())
    t = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.expr("percentile(gap_ns, 0.5)").alias("p50"),
        F.expr("percentile(gap_ns, 0.9)").alias("p90"),
        F.expr("percentile(gap_ns, 0.99)").alias("p99"),
    )
    return (
        t.where(F.col("n_gaps") >= 2)
        .select(
            "event_type",
            "n_gaps",
            F.round(F.col("p50") / 1e9, 6).alias("p50_gap_s"),
            F.round(F.col("p90") / 1e9, 6).alias("p90_gap_s"),
            F.round(F.col("p99") / 1e9, 6).alias("p99_gap_s"),
        )
        .orderBy("event_type")
    )
