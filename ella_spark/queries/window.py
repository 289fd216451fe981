"""Window functions (SURVEY.md §2.B "Window fns").

The reference inherits ranking / navigation / framed-aggregate window
functions from DataFusion 27; Spark's Window API is a superset. Every
ORDER BY inside a window uses a unique key suffix so results are
deterministic under the driver's hash comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ella_spark.queries import register
from ella_spark.sources import load_table


@register(
    "q_rank_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
             rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
             dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk
      FROM customer)
    WHERE rn <= 3
    """,
    doc="Top-N per group: row_number / rank / dense_rank.",
)
def q_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "q_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_price,
           round(avg(l_extendedprice) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4)         AS centered_avg
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    doc="Framed window aggregates: running sum + centered moving average.",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1000)
    run = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctr = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(-1, 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(run), 2).alias("running_price"),
        F.round(F.avg("l_extendedprice").over(ctr), 4).alias("centered_avg"),
    )


@register(
    "q_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           (ts // 1000) AS ts_us,
           lag(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           (ts // 1000) - (lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) // 1000) AS us_since_prev
    FROM (SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts FROM events)
    """,
    doc="lag/lead navigation over per-user event streams (ns time kept as long).",
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.expr(
            "(ts div 1000) - (lag(ts) over (partition by user_id order by ts, event_id) div 1000)"
        ).alias("us_since_prev"),
    )


@register(
    "q_ntile_percentiles",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
           round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
           round(cume_dist()    OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cume
    FROM orders
    """,
    doc="ntile / percent_rank / cume_dist global ranking.",
)
def q_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT Window.orderBy(...) with an empty partition spec: Spark
    # plans that as ONE task sorting every order — the last unbounded
    # serial stage in the registry (r14). global_order_stats gets the
    # identical numbers from a range-partitioned sort + positional
    # arithmetic (the order is total: o_orderkey is unique), fully
    # distributed; percent_rank/cume_dist are the same (pos-1)/(n-1)
    # and pos/n divisions the window functions compute, so the values
    # are bit-identical.
    from ella_spark.operators.skew import global_order_stats

    o = load_table(spark, sf_dir, "orders")
    ranked = global_order_stats(
        o.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
        ntile_n=4,
    )
    total1 = F.greatest(F.col("_total") - 1, F.lit(1))
    return ranked.select(
        "o_orderkey",
        F.col("_ntile").alias("quartile"),
        F.round(
            F.when(F.col("_total") == 1, F.lit(0.0)).otherwise(
                (F.col("_pos") - 1).cast("double") / total1.cast("double")
            ),
            6,
        ).alias("pct_rank"),
        F.round(
            F.col("_pos").cast("double") / F.col("_total").cast("double"), 6
        ).alias("cume"),
    )


@register(
    "q_first_last_value",
    oracle="""
    SELECT DISTINCT c_nationkey,
           first_value(c_name) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
           last_value(c_name) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)  AS poorest,
           nth_value(c_name, 2) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)  AS runner_up
    FROM customer
    """,
    doc="first/last/nth_value over full-partition frames.",
)
def q_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_nationkey",
        F.first("c_name").over(w).alias("richest"),
        F.last("c_name").over(w).alias("poorest"),
        F.nth_value("c_name", 2).over(w).alias("runner_up"),
    ).distinct()
