"""Relational surface: scans, filters, joins, aggregation, set ops,
subqueries, scalar functions (SURVEY.md §2.B).

The reference inherits all of this verbatim from DataFusion 27
(ella-engine/src/engine/state.rs:115-133); here Catalyst provides the
same surface. Implementations are DataFrame-first so Catalyst gets a
declarative plan: filters sit directly on scans (predicate pushdown),
small dims are broadcast (no shuffle for the dim side), and
aggregations use built-in JVM functions (whole-stage codegen).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ella_spark.queries import register
from ella_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Aggregation: partial/final hash agg, multiple agg fns ---------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,8))), 2) AS DOUBLE)
                                                                       AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,8))), 2) AS DOUBLE)        AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              AS DECIMAL(28,8))), 2) AS DOUBLE)        AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE)
                 / count(*), 4)                                        AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(28,8))) AS DOUBLE)
                 / count(*), 4)                                        AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filtered scan -> hash aggregate (map-side "
    "partial). Money sums/avgs go through DECIMAL(28,8): the groups "
    "are ~1/4 of lineitem each, where a plain double sum's "
    "summation-order ulp drift can flip the rounding cross-engine "
    "(the q_date_bin_5min lesson, measured at sf0.1). l_quantity "
    "sums stay double: integer-valued doubles sum exactly.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    price_dec = F.sum(F.col("l_extendedprice").cast("decimal(28,8)"))
    disc_dec = F.sum(F.col("l_discount").cast("decimal(28,8)"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1999-06-30 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(price_dec, 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax"))
                    ).cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                price_dec.cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_price"),
            F.round(
                disc_dec.cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_stats",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
               sum(CAST(o_totalprice AS DECIMAL(18,2))
                   * CAST(o_totalprice AS DECIMAL(18,2))) AS sx2,
               count(*)                  AS n,
               min(o_totalprice)         AS min_p,
               max(o_totalprice)         AS max_p,
               count(DISTINCT o_custkey) AS n_cust
        FROM orders
        GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           round(sqrt((CAST(sx2 AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                      / (n - 1)), 4) AS std_price,
           round((CAST(sx2 AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                 / (n - 1), 4)       AS var_price,
           round(min_p, 2)           AS min_price,
           round(max_p, 2)           AS max_price,
           n_cust
    FROM s
    """,
    doc="Statistical aggregates: stddev/variance/min/max/count distinct. "
    "Variance is computed from exact decimal sums (o_totalprice is a 2-dp "
    "value, so DECIMAL(18,2) sums are exact) then identical IEEE-double "
    "scalar math on both engines — Spark's partition-parallel moment "
    "aggregation would otherwise diverge from DuckDB in the last digit.",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    s = o.groupBy("o_orderstatus").agg(
        F.sum(d).alias("sx"),
        F.sum(d * d).alias("sx2"),
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_p"),
        F.max("o_totalprice").alias("max_p"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )
    var = (
        F.col("sx2").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n")
    ) / (F.col("n") - F.lit(1))
    return s.select(
        "o_orderstatus",
        F.round(F.sqrt(var), 4).alias("std_price"),
        F.round(var, 4).alias("var_price"),
        F.round("min_p", 2).alias("min_price"),
        F.round("max_p", 2).alias("max_price"),
        "n_cust",
    )


@register(
    "q_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Correlation / covariance aggregates.",
)
def q_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
    )


@register(
    "q_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL')  AS region_name,
           coalesce(n_name, 'ALL')  AS nation_name,
           count(*)                 AS n_customers,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,8))), 2) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchical aggregation over broadcast-joined dims.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_bal",
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n_orders,
           round(avg(o_totalprice), 4)      AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="GROUPING SETS via Spark SQL.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*)                         AS n_orders,
               round(avg(o_totalprice), 4)      AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3
    """,
    doc="GROUP BY + HAVING post-aggregation filter.",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .where(F.col("n_orders") >= 3)
    )


# --- Joins ---------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: 3-way join, broadcast dim, agg, top-k (TakeOrderedAndProject).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customer scales with SF: no forced broadcast — Catalyst's size
    # threshold broadcasts it while it fits and shuffles it when it
    # doesn't (a forced hint would OOM at 100x)
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: 6-way join incl. compound join key; dims broadcast. "
    "r15 (guide §3.2): the region predicate reaches customer and "
    "supplier BEFORE the fact joins via a broadcast semi-join on the "
    "ASIA nation keys (a constant-size frame, <= 25 rows). The join "
    "graph forces c_nationkey = s_nationkey and s_nationkey in ASIA, "
    "so the prefilter removes only rows that could never survive — "
    "but Catalyst cannot infer it (predicate transitivity across the "
    "region JOIN's membership is not a rewrite it applies), so "
    "without it every c/o/li shuffle carries 5x the surviving bytes.",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")  # scales with SF: size-based broadcast
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    # constant-size (<= nations) key list: nation x ASIA-region
    asia_keys = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(
            _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = c.join(
        asia_keys, c.c_nationkey == asia_keys.n_nationkey, "left_semi"
    )
    s = s.join(
        asia_keys, s.s_nationkey == asia_keys.n_nationkey, "left_semi"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .join(
            s,
            (F.col("l_suppkey") == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


@register(
    "q_outer_join",
    oracle="""
    SELECT c_custkey, c_name,
           coalesce(cnt, 0)             AS n_orders,
           round(coalesce(spend, 0), 2) AS spend
    FROM customer
    LEFT JOIN (
      SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    """,
    doc="Left outer join against pre-aggregated subquery.",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("spend"))
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("spend", F.lit(0.0)), 2).alias("spend"),
    )


@register(
    "q_full_outer_join",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 50000),
         rich   AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT coalesce(b.k, r.k) AS custkey,
           (b.k IS NOT NULL)  AS is_big_buyer,
           (r.k IS NOT NULL)  AS is_rich
    FROM buyers b FULL OUTER JOIN rich r ON b.k = r.k
    """,
    doc="Full outer join of two derived key sets.",
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    buyers = (
        o.where(F.col("o_totalprice") > 50000).select(F.col("o_custkey").alias("k")).distinct()
    )
    rich = c.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    b, r = buyers.alias("b"), rich.alias("r")
    return b.join(r, F.col("b.k") == F.col("r.k"), "full").select(
        F.coalesce(F.col("b.k"), F.col("r.k")).alias("custkey"),
        F.col("b.k").isNotNull().alias("is_big_buyer"),
        F.col("r.k").isNotNull().alias("is_rich"),
    )


@register(
    "q_semi_anti_join",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
    """,
    doc="Left-semi and left-anti joins (EXISTS / NOT EXISTS equivalents).",
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n_with_orders")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_without_orders")
    )
    return semi.crossJoin(anti)


@register(
    "q_cross_join",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
    doc="Cross join (small-small) with post-filter.",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = _t(spark, sf_dir, "region").alias("r1")
    r2 = _t(spark, sf_dir, "region").alias("r2")
    return r1.crossJoin(r2).where(
        F.col("r1.r_regionkey") < F.col("r2.r_regionkey")
    ).select(F.col("r1.r_name").alias("region_a"), F.col("r2.r_name").alias("region_b"))


@register(
    "q_non_equi_join",
    oracle="""
    SELECT p_brand, count(*) AS n_close_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_quantity BETWEEN p_size - 2 AND p_size + 2
    GROUP BY p_brand
    """,
    doc="Equi join + range (non-equi) residual predicate.",
)
def q_non_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")  # scales with SF: size-based broadcast
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & li.l_quantity.between(p.p_size - 2, p.p_size + 2),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_close_qty"))
    )


# --- Set operations -------------------------------------------------------

@register(
    "q_set_ops",
    oracle="""
    WITH big AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000),
         pri AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'union' AS op, count(*) AS n FROM (SELECT DISTINCT k FROM (SELECT k FROM big UNION SELECT k FROM pri))
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM big INTERSECT SELECT k FROM pri)
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (SELECT k FROM big EXCEPT SELECT k FROM pri)
    """,
    doc="UNION / INTERSECT / EXCEPT over derived key sets.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    pri = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )

    def counted(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        counted(big.union(pri).distinct(), "union")
        .unionAll(counted(big.intersect(pri), "intersect"))
        .unionAll(counted(big.subtract(pri), "except"))
    )


# --- Subqueries ------------------------------------------------------------

@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
    doc="Scalar subquery in WHERE.",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


@register(
    "q_correlated_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
    doc="Correlated scalar subquery (Catalyst decorrelates to join).",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "q_in_subquery",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity > 45
    )
    """,
    doc="IN subquery (plans as left-semi join).",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        """
    )


# --- Expression language ---------------------------------------------------

@register(
    "q_case_cast_like",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'high'
                WHEN o_totalprice >= 50000  THEN 'mid'
                ELSE 'low' END                       AS price_band,
           CAST(trunc(o_totalprice) AS BIGINT)       AS price_int,
           (o_orderpriority LIKE '1-%')              AS is_urgent,
           (o_orderstatus IN ('F', 'P'))             AS is_done_or_partial,
           (o_totalprice BETWEEN 1000 AND 2000)      AS is_small_band,
           (o_custkey IS NULL)                       AS cust_missing
    FROM orders
    """,
    doc="CASE / CAST / LIKE / IN / BETWEEN / IS NULL expression matrix.",
)
def q_case_cast_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "high")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderpriority").like("1-%").alias("is_urgent"),
        F.col("o_orderstatus").isin("F", "P").alias("is_done_or_partial"),
        F.col("o_totalprice").between(1000, 2000).alias("is_small_band"),
        F.col("o_custkey").isNull().alias("cust_missing"),
    )


@register(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                         AS lname,
           upper(c_mktsegment)                   AS useg,
           length(c_name)                        AS name_len,
           substr(c_name, 1, 8)                  AS name_prefix,
           concat(c_name, ':', c_mktsegment)     AS name_seg,
           replace(c_name, '#', '-')             AS name_dash,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           trim(c_name)                          AS trimmed,
           reverse(c_mktsegment)                 AS seg_rev,
           split_part(c_name, '#', 2)            AS name_num,
           starts_with(c_name, 'Customer')       AS is_cust,
           md5(c_name)                           AS name_md5,
           strpos(c_name, '#')                   AS hash_pos
    FROM customer
    """,
    doc="String function matrix (concat/substr/pad/replace/split_part/md5/...).",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("", F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias(
            "name_seg"
        ),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.trim("c_name").alias("trimmed"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_cust"),
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 4)        AS abs_diff,
           CAST(ceil(l_quantity) AS BIGINT)              AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
           round(sqrt(l_extendedprice), 6)               AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)             AS price_ln,
           round(log10(l_extendedprice + 1), 6)          AS price_log10,
           round(exp(l_discount), 6)                     AS disc_exp,
           round(power(l_tax + 1, 2), 6)                 AS tax_sq,
           round(sin(l_quantity), 6)                     AS qty_sin,
           round(atan2(l_quantity, 10.0), 6)             AS qty_atan2,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign,
           mod(CAST(l_quantity AS BIGINT), 7)            AS qty_mod
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    doc="Math function matrix (abs/ceil/floor/sqrt/ln/log10/exp/pow/trig/sign/mod).",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 4).alias("abs_diff"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.round(F.sin("l_quantity"), 6).alias("qty_sin"),
        F.round(F.atan2(F.col("l_quantity"), F.lit(10.0)), 6).alias("qty_atan2"),
        F.signum(F.col("l_extendedprice") - 30000).alias("price_sign"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@register(
    "q_conditional_funcs",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0)                            AS bal_clamped,
           least(c_acctbal, 1000.0)                            AS bal_capped,
           if(c_acctbal < 0, 'debt', 'credit')                 AS bal_state
    FROM customer
    """,
    doc="coalesce/nullif/greatest/least/if conditionals.",
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
        F.when(F.col("c_acctbal") < 0, "debt").otherwise("credit").alias("bal_state"),
    )


# --- Sort / limit / offset -------------------------------------------------

@register(
    "q_order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
    doc="Global sort + limit + offset with deterministic tiebreak.",
)
def q_order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(20)
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="DISTINCT projection.",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --- Additional TPC-H-shaped headline queries ------------------------------

@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                              AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: tight multi-predicate scan -> global agg. All "
    "predicates reach the parquet scan (PushedFilters); zero shuffle "
    "beyond the single-row final agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount"))
                    .cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: 4-way join -> agg -> top-k. lineitem/orders "
    "shuffle on their join keys (both scale with SF); customer joins "
    "the pre-aggregated order revenue and nation is broadcast. Filters "
    "on orderdate/returnflag push to the scans, shrinking the shuffle.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: fact x dim join with conditional aggregate. "
    "part is broadcast (stays executor-memory-sized while lineitem "
    "scales with SF) -> no shuffle for the join; the date filter "
    "pushes to the lineitem scan.",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")  # scales with SF: size-based broadcast
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE aggregate with grouping() markers (completes the "
    "GROUPING SETS / ROLLUP / CUBE matrix from SURVEY.md §2.B).",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_approx_aggs",
    oracle=None,  # sketch-based: HLL/KLL estimates differ per engine;
    # tests assert relative error vs exact counts instead
    doc="Approximate aggregates: approx_count_distinct (HyperLogLog++) "
    "and percentile_approx (KLL-style sketch) — constant-memory "
    "distinct counts / quantiles at 100 TB where exact DISTINCT "
    "would shuffle every key.",
)
def q_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("approx_p95_price"),
    )


@register(
    "q_array_bool_aggs",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           bool_and(o_totalprice > 1000)     AS all_over_1k,
           bool_or(o_totalprice > 400000)    AS any_over_400k,
           bit_and(o_orderkey % 256)         AS key_bit_and,
           bit_or(o_orderkey % 256)          AS key_bit_or,
           count(*)                          AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="array_agg / bool_and / bool_or / bit_and / bit_or aggregates "
    "(DataFusion-27 agg surface, SURVEY §2.B aggregation row; the "
    "collected set is sorted+joined so the comparison is order-free).",
)
def q_array_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.bit_and(F.col("o_orderkey") % 256).alias("key_bit_and"),
        F.bit_or(F.col("o_orderkey") % 256).alias("key_bit_or"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_string_funcs2",
    oracle="""
    SELECT c_custkey,
           to_hex(c_custkey)                          AS key_hex,
           ascii(c_mktsegment)                        AS seg_ascii,
           chr(CAST(65 + c_custkey % 26 AS INTEGER))  AS key_chr,
           left(c_name, 9)                            AS name_left,
           right(c_name, 3)                           AS name_right,
           repeat(c_mktsegment, 2)                    AS seg_twice,
           translate(c_mktsegment, 'AEIOU', 'aeiou')  AS seg_lowvowel,
           substr(sha256(c_name), 1, 16)              AS name_sha16,
           regexp_replace(c_name, '[0-9]', '*', 'g')  AS name_masked,
           ltrim(rtrim('  ' || c_name || '  '))       AS name_trim
    FROM customer
    """,
    doc="Second string-function matrix: to_hex/ascii/chr/left/right/"
    "repeat/translate/sha256/regexp_replace/ltrim/rtrim (completes the "
    "DataFusion-27 string surface, SURVEY §2.B).",
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.hex(F.col("c_custkey")).alias("key_hex"),
        F.ascii(F.col("c_mktsegment")).alias("seg_ascii"),
        F.char(F.lit(65) + F.col("c_custkey") % 26).alias("key_chr"),
        F.substring("c_name", 1, 9).alias("name_left"),
        F.substring(F.col("c_name"), -3, 3).alias("name_right"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_lowvowel"),
        F.substring(F.sha2(F.col("c_name"), 256), 1, 16).alias("name_sha16"),
        F.regexp_replace("c_name", "[0-9]", "*").alias("name_masked"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  ")))).alias(
            "name_trim"
        ),
    )


@register(
    "q_time_convs",
    oracle="""
    SELECT o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT)       AS epoch_s,
           epoch_ms(o_orderdate)                    AS epoch_ms,
           to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)) AT TIME ZONE 'UTC'
                                                    AS ts_roundtrip,
           strftime(o_orderdate, '%Y-%m-%d')        AS day_str
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    doc="Timestamp conversion matrix: to_timestamp/from_unixtime/"
    "epoch seconds+millis/format (DataFusion date/time surface).",
)
def q_time_convs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_ms"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("ts_roundtrip"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day_str"),
    )


@register(
    "q_set_ops_all",
    oracle="""
    WITH big AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000),
         pri AS (SELECT o_custkey AS k FROM orders
                 WHERE o_orderpriority = '1-URGENT')
    SELECT 'union_all' AS op, count(*) AS n
      FROM (SELECT k FROM big UNION ALL SELECT k FROM pri)
    UNION ALL
    SELECT 'intersect_all' AS op, count(*) AS n
      FROM (SELECT k FROM big INTERSECT ALL SELECT k FROM pri)
    UNION ALL
    SELECT 'except_all' AS op, count(*) AS n
      FROM (SELECT k FROM big EXCEPT ALL SELECT k FROM pri)
    """,
    doc="Bag-semantics set ops (UNION ALL / INTERSECT ALL / EXCEPT ALL "
    "— duplicate multiplicity preserved; completes the DataFusion set-"
    "op surface next to q_set_ops's distinct variants).",
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    pri = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    def counted(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
    return (
        counted("union_all", big.unionAll(pri))
        .unionAll(counted("intersect_all", big.intersectAll(pri)))
        .unionAll(counted("except_all", big.exceptAll(pri)))
    )


@register(
    "q_regr_funcs",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 4)      AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 4)      AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Linear-regression aggregate family (regr_slope/intercept/r2/"
    "count/avgx/avgy) — completes the DataFusion stats-aggregate "
    "surface next to q_agg_stats and q_corr_covar.",
)
def q_regr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@register(
    "q_salted_join",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                            AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2)   AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Skew-resilient salted join (operators/skew.py): the left side "
    "gets a deterministic salt, the right side replicates salt ways, "
    "and the shuffle key becomes (orderkey, salt) — spreading a hot "
    "orderkey over `salt` reducers. The oracle is the PLAIN join: the "
    "driver verifies salting is result-invariant.",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    joined = salted_join(li, o, keys=["l_orderkey"], how="inner", salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(28,8)")
            ),
            2,
        ).cast("double").alias("revenue"),
    )


@register(
    "q_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4)       AS median_qty,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(quantile_cont(l_discount, 0.25), 4)      AS p25_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="EXACT percentiles (interpolated, SQL percentile_cont semantics) "
    "per group — complements q_approx_aggs' sketch-based quantiles. "
    "Spark's percentile() aggregate sorts within each group partition; "
    "the interpolation of an exact sorted multiset is deterministic, so "
    "values match DuckDB's quantile_cont bit-for-bit after round(4). "
    "At scale the exact sort is the cost the approx query avoids — both "
    "belong in the surface (exact for audits, sketch for dashboards).",
)
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
            F.round(F.expr("percentile(l_discount, 0.25)"), 4).alias("p25_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_value_histogram",
    oracle="""
    SELECT least(CAST(floor(l_quantity / 5.0) AS BIGINT), 10) AS bucket,
           count(*) AS n,
           round(min(l_quantity), 2) AS lo,
           round(max(l_quantity), 2) AS hi,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS bucket_revenue
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Fixed-width value histogram (bucket = floor(qty/5), clamped) "
    "with per-bucket count/min/max/revenue — the profiling primitive "
    "behind data-quality dashboards. One hash aggregate over an "
    "integer bucket key: map-side partials shrink each partition to "
    "≤11 rows before the shuffle, so the plan is scan-bound at any SF. "
    "DECIMAL revenue sums keep the oracle comparison exact.",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_quantity") / 5.0).cast("bigint"), F.lit(10).cast("bigint")
    )
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_quantity"), 2).alias("lo"),
            F.round(F.max("l_quantity"), 2).alias("hi"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("bucket_revenue"),
        )
        .orderBy("bucket")
    )


# --- Lateral joins & unpivot (round 6) -----------------------------------

@register(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    """,
    doc="Correlated LATERAL subquery with per-row top-k (the two "
    "richest customers per nation) — DataFrame.lateralJoin with an "
    "outer() column reference. Catalyst DECORRELATES the per-nation "
    "ORDER BY/LIMIT into a single window-rank pass over customer "
    "(one shuffle on c_nationkey), so the plan never executes the "
    "subquery per outer row — the shape that makes lateral top-k "
    "viable at 100 TB where a nested re-scan per key would not be.",
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    sub = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(2)
        .select("c_name", "c_acctbal")
    )
    return n.lateralJoin(sub).select("n_name", "c_name", "c_acctbal")


@register(
    "q_unpivot_measures",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(sum(CAST(l_quantity      AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
             CAST(round(sum(CAST(l_discount     AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_base_price', sum_base_price FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM w
    """,
    doc="Wide->long UNPIVOT (DataFrame.unpivot / SQL stack): one "
    "hash-aggregate produces the wide per-flag measure row, then the "
    "unpivot is a narrow generator expression — no extra shuffle, "
    "3x rows out of the tiny aggregate, never out of the fact table. "
    "DECIMAL sums keep the measure values exact cross-engine.",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_base_price"),
        F.round(F.sum(F.col("l_discount").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_disc"),
    )
    return wide.unpivot(
        "l_returnflag",
        ["sum_qty", "sum_base_price", "sum_disc"],
        "measure",
        "value",
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Ordered string aggregation (listagg WITHIN GROUP / "
    "string_agg ORDER BY): nations per region as one deterministic "
    "comma-joined string. The WITHIN GROUP ordering is what makes the "
    "value reproducible — an unordered listagg is partition-order-"
    "dependent and would never hash-match cross-engine.",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


@register(
    "q_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS cnt
      FROM documents GROUP BY source, lang)
    SELECT source, lang AS mode_lang, cnt AS mode_count
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY cnt DESC, lang) AS rn
      FROM c)
    WHERE rn = 1
    """,
    doc="mode() aggregate with a PINNED tie contract: the most frequent "
    "lang per source, ties to the lexicographically smallest value. "
    "Native mode() leaves ties implementation-defined in both engines, "
    "so the portable form is count-group + per-group top-1 window — "
    "two map-side-partial shuffles on (source[, lang]), never a "
    "value-set collect.",
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), "lang")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("mode_lang"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register(
    "q_approx_top_k",
    oracle="""
    SELECT source, lang AS item, count(*) AS cnt
    FROM documents
    WHERE lang IS NOT NULL
    GROUP BY source, lang
    ORDER BY source, item
    """,
    doc="approx_top_k end-to-end with an EXACT oracle: k (5) covers "
    "every distinct lang, so the DataSketches frequent-items sketch "
    "is in its exact regime and the exploded (item, count) rows equal "
    "a plain count group-by — the hash-green representative of the "
    "approximate-aggregate family (q_approx_aggs stays the rows-only "
    "estimator-behavior probe). Map-side sketch partials merge like "
    "any aggregate; the explode is O(groups * k).",
)
def q_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-k of OBSERVED (non-null) items, mirrored in the oracle's
    # WHERE: Spark's approx_top_k counts NULL as an item, and a NULL
    # group would break the "k covers every distinct value"
    # exact-regime contract this oracle depends on (r14 fuzz)
    d = _t(spark, sf_dir, "documents").where(F.col("lang").isNotNull())
    sk = d.groupBy("source").agg(
        F.expr("approx_top_k(lang, 5, 100)").alias("tk")
    )
    return (
        sk.select("source", F.explode("tk").alias("e"))
        .select(
            "source",
            F.col("e.item").alias("item"),
            F.col("e.count").alias("cnt"),
        )
        .orderBy("source", "item")
    )


# ── round-7 additions ────────────────────────────────────────────────


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "q_data_profile",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           count(*) AS n_rows,
           count(*) - count({c}) AS n_null,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS DOUBLE) AS vmin,
           CAST(max({c}) AS DOUBLE) AS vmax
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
    doc="Column profiling (the data-quality pass every ingestion "
    "pipeline runs first): per-column row/null/exact-distinct counts "
    "and min/max, for several columns in ONE scan — Spark computes "
    "all metrics in a single multi-count-distinct aggregate (Catalyst "
    "expands it via one Expand node, not N scans) and unpivots the "
    "20 scalars driver-side; the oracle spells it as a UNION ALL.",
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__dist").alias("n_distinct"),
                F.col(f"{c}__min").alias("vmin"),
                F.col(f"{c}__max").alias("vmax"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


@register(
    "q_minmax_scale",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events),
    ext AS (
      SELECT user_id, event_id, vc,
             min(vc) OVER (PARTITION BY user_id) AS lo,
             max(vc) OVER (PARTITION BY user_id) AS hi
      FROM c)
    SELECT user_id, event_id,
           CAST(CASE WHEN hi > lo
                     THEN ((vc - lo) * 1000000) // (hi - lo)
                     ELSE 500000 END AS DOUBLE) / 1000000 AS scaled
    FROM ext
    """,
    doc="Per-group min-max feature scaling to [0, 1] (degenerate "
    "single-value groups pin to 0.5): one unordered partition window "
    "computes both extrema in a single user_id shuffle — the "
    "normalize-before-training primitive. The ratio is carried as "
    "exact integer parts-per-million over centi-unit values "
    "(events.value is 2-decimal, non-negative): a double divide + "
    "round lands on ties where Spark's shortest-repr HALF_UP and "
    "DuckDB's binary rounding legally disagree; integer floor "
    "division cannot.",
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    vc = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    c = ev.select("user_id", "event_id", vc.alias("vc"))
    lo, hi = F.min("vc").over(w), F.max("vc").over(w)
    ext = c.withColumns({"_lo": lo, "_hi": hi})
    ppm = F.when(
        F.col("_hi") > F.col("_lo"),
        F.expr("((vc - _lo) * 1000000) div (_hi - _lo)"),
    ).otherwise(F.lit(500000))
    return ext.select(
        "user_id", "event_id", (ppm.cast("double") / 1000000).alias("scaled")
    )


_KMV_K = 65536


@register(
    "q_distinct_overlap",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    cnt AS (SELECT event_type, count(*) AS c FROM du GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb, a.c AS ca, b.c AS cb
      FROM cnt a JOIN cnt b ON a.event_type < b.event_type),
    inter AS (
      SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS shared
      FROM du x JOIN du y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY x.event_type, y.event_type),
    j AS (
      SELECT p.ta, p.tb, p.ca, p.cb, COALESCE(i.shared, 0) AS shared,
             p.ca + p.cb - COALESCE(i.shared, 0) AS u
      FROM pairs p LEFT JOIN inter i ON i.ta = p.ta AND i.tb = p.tb)
    SELECT ta AS type_a, tb AS type_b,
           CAST(ca AS DOUBLE) AS users_a, CAST(cb AS DOUBLE) AS users_b,
           CAST(u AS DOUBLE) AS union_users,
           CAST(shared AS DOUBLE) / u AS jaccard,
           CAST(shared AS DOUBLE) / u * CAST(u AS DOUBLE) AS shared_est
    FROM j ORDER BY type_a, type_b
    """,
    doc="KMV (bottom-k) distinct-overlap sketch between event types "
    "(operators.sketch.kmv_overlap, Beyer et al. SIGMOD'07): per-type "
    "bottom-k of xxhash64(user_id), pairwise merge-and-recut, "
    "shared/|merged| Jaccard, jaccard x union_est intersection — the "
    "distinct-INTERSECTION shape HLL cannot express. k=65536 exceeds "
    "the distinct-user count at recorded SFs, so every sketch holds "
    "its full set and the DuckDB oracle is the exact overlap with the "
    "estimator formula mirrored step-for-step (each double op is one "
    "correctly-rounded IEEE op on exact integers — bit-identical; "
    "same exact-when-fits contract as quantile_rollup/approx_top_k). "
    "Entirely JVM-side: hash + distinct + per-group row_number, one "
    "group-keyed shuffle to build, pair-keyed bounded (≤2k rows) "
    "stages after; approximate-regime error bounds are pinned in "
    "tests/test_sketch.py.",
)
def q_distinct_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.sketch import kmv_overlap

    ev = _t(spark, sf_dir, "events")
    out = kmv_overlap(ev, "event_type", "user_id", k=_KMV_K)
    return out.select(
        F.col("grp_a").alias("type_a"),
        F.col("grp_b").alias("type_b"),
        F.col("est_a").alias("users_a"),
        F.col("est_b").alias("users_b"),
        F.col("union_est").alias("union_users"),
        "jaccard",
        F.col("inter_est").alias("shared_est"),
    ).orderBy("type_a", "type_b")


_PSI_BUCKETS = 10


@register(
    "q_psi_drift",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events),
    ext AS (SELECT min(vc) AS lo, max(vc) AS hi FROM c),
    b AS (
      SELECT c.event_type,
             CASE WHEN ext.hi > ext.lo
                  THEN least(((c.vc - ext.lo) * {_PSI_BUCKETS})
                             // (ext.hi - ext.lo), {_PSI_BUCKETS - 1})
                  ELSE 0 END AS bucket
      FROM c, ext),
    tb AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c_tb
      FROM b GROUP BY event_type, bucket),
    tot AS (
      SELECT event_type, CAST(sum(c_tb) AS BIGINT) AS n_t
      FROM tb GROUP BY event_type),
    bk AS (
      SELECT bucket, CAST(sum(c_tb) AS BIGINT) AS c_b
      FROM tb GROUP BY bucket),
    n AS (SELECT CAST(sum(c_tb) AS BIGINT) AS big_n FROM tb)
    SELECT tb.event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           round(sum(
             (CAST(c_tb AS DOUBLE) / n_t - CAST(c_b AS DOUBLE) / big_n)
             * ln((CAST(c_tb AS DOUBLE) * big_n)
                  / (CAST(c_b AS DOUBLE) * n_t))), 6) AS psi
    FROM tb
    JOIN tot ON tot.event_type IS NOT DISTINCT FROM tb.event_type
    JOIN bk ON bk.bucket = tb.bucket
    CROSS JOIN n
    GROUP BY tb.event_type
    ORDER BY tb.event_type
    """,
    doc="Population Stability Index per event_type vs the pooled value "
    "distribution — the standard drift monitor a training-data "
    "pipeline runs between corpus snapshots ('did this slice's "
    "feature distribution move?'). Values land in 10 equal-width "
    "buckets of the global centi-unit range (bucket index is exact "
    "int64 floor-division), counts aggregate in ONE (type, bucket) "
    "shuffle, and the reference/bucket marginals come from the "
    "ALREADY-AGGREGATED ≤ types×10-row frame (window-sized joins, "
    "never a second scan). PSI terms use only buckets where the type "
    "has mass (q > 0 follows); round(6) absorbs summation-order ulps. "
    "At 100 TB: one scan + one tiny shuffle — the marginals frame is "
    "O(types·buckets) regardless of row count.",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    B = _PSI_BUCKETS
    c = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    ext = c.agg(F.min("vc").alias("lo"), F.max("vc").alias("hi"))
    b = c.crossJoin(F.broadcast(ext)).select(
        "event_type",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.expr(f"((vc - lo) * {B}) div (hi - lo)"),
                F.lit(B - 1).cast("bigint"),
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("bucket"),
    )
    tb = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("c_tb")
    )
    w_t = Window.partitionBy("event_type")
    w_b = Window.partitionBy("bucket")
    w_all = Window.partitionBy()
    m = tb.withColumns(
        {
            "n_t": F.sum("c_tb").over(w_t),
            "c_b": F.sum("c_tb").over(w_b),
            "big_n": F.sum("c_tb").over(w_all),
        }
    )
    term = (
        F.col("c_tb").cast("double") / F.col("n_t")
        - F.col("c_b").cast("double") / F.col("big_n")
    ) * F.log(
        (F.col("c_tb").cast("double") * F.col("big_n"))
        / (F.col("c_b").cast("double") * F.col("n_t"))
    )
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.sum(term), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


@register(
    "q_chi2_drift",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
      FROM documents GROUP BY lang, source),
    r AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rt FROM o GROUP BY lang),
    s AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY source),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS big_n,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_src
          FROM o)
    SELECT o.lang,
           CAST(n.n_src - 1 AS BIGINT) AS dof,
           round(CAST(r.rt AS DOUBLE) + sum(
             (CAST(obs AS DOUBLE)
              - CAST(r.rt AS DOUBLE) * s.ct / n.big_n)
             * (CAST(obs AS DOUBLE)
                - CAST(r.rt AS DOUBLE) * s.ct / n.big_n)
             / (CAST(r.rt AS DOUBLE) * s.ct / n.big_n)
             - CAST(r.rt AS DOUBLE) * s.ct / n.big_n), 6) AS chi2
    FROM o
    JOIN r ON r.lang = o.lang
    JOIN s ON s.source = o.source
    CROSS JOIN n
    GROUP BY o.lang, r.rt, n.n_src
    ORDER BY o.lang
    """,
    doc="Chi-squared source-mix drift per language: is this language's "
    "source distribution consistent with the corpus-wide source "
    "marginals? (The contingency-table independence statistic corpus "
    "dashboards track per slice.) Expected cell e = rt*ct/N; cells "
    "the language never observed still contribute (0-e)^2/e = e, "
    "folded in WITHOUT materializing the empty cells via the "
    "identity sum_all e = rt: chi2_l = rt_l + sum_observed((o-e)^2/e "
    "- e). ONE (lang, source) groupBy shuffle over the scan; the "
    "marginals frames are O(langs)+O(sources) rows, broadcast-joined "
    "back onto the ≤ langs×sources aggregated frame. Double math is "
    "the same op sequence both engines; round(6) absorbs "
    "summation-order ulps.",
)
def q_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    # O(langs x sources) frame feeds FOUR consumers (cells + both
    # marginals + totals): cut it or each one replays the corpus scan
    # (the q_cramers_v idiom; un-cut, the final plan ran 4 scans, r14).
    # Lazy (r15): the cut is the LogicalRDD plan boundary, which lazy
    # checkpointing establishes too; the first consumer materializes
    # the blocks in-line instead of paying a separate eager job.
    o = o.localCheckpoint(eager=False)
    r = o.groupBy("lang").agg(F.sum("obs").alias("rt"))
    s = o.groupBy("source").agg(F.sum("obs").alias("ct"))
    n = o.agg(
        F.sum("obs").alias("big_n"),
        F.countDistinct("source").alias("n_src"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("big_n")
    term = (
        (F.col("obs").cast("double") - e) * (F.col("obs").cast("double") - e) / e
        - e
    )
    return (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(n))
        .groupBy("lang", "rt", "n_src")
        .agg(
            F.round(F.col("rt").cast("double") + F.sum(term), 6).alias("chi2")
        )
        .select(
            "lang",
            (F.col("n_src") - 1).cast("bigint").alias("dof"),
            "chi2",
        )
        .orderBy("lang")
    )


#: hard cap on the pooled-ECDF evaluation grid (distinct centi-values).
#: The docstrings said "quantize first at unbounded cardinality" but
#: nothing enforced it (r9 VERDICT #5); past the cap the frame now
#: re-quantizes ITSELF onto <= cap equal-width int64 points. 200k
#: distinct points x O(types) slices stays comfortably in one
#: executor's window-partition memory at any corpus size.
_ECDF_MAX_GRID = 200_000

#: the SAME conditional quantization as SQL text, spliced into the
#: q_ks_drift / q_earth_movers / q_mann_whitney ORACLES so the DuckDB
#: side coarsens IDENTICALLY when the cap fires (round-10 self-review:
#: a Spark-only cap would hash-mismatch exactly on the inputs it
#: guards against). Expects a prior CTE `c(event_type, vc)`; yields
#: `tv(event_type, vc, c_tv)` — exact when n_vals <= cap (width 1 is
#: an identity re-aggregation), identically-binned past it.
_CAPPED_TV_CTE = f"""
    tv0 AS (
      SELECT event_type, vc, CAST(count(*) AS BIGINT) AS c_tv
      FROM c GROUP BY event_type, vc),
    wdt AS (
      SELECT CASE WHEN count(DISTINCT vc) > {_ECDF_MAX_GRID}
                  THEN greatest((max(vc) - min(vc) + {_ECDF_MAX_GRID} - 1)
                                // {_ECDF_MAX_GRID}, 1)
                  ELSE 1 END AS w,
             min(vc) AS lo
      FROM tv0),
    tv AS (
      SELECT event_type,
             vc - ((vc - wdt.lo) % wdt.w) AS vc,
             CAST(sum(c_tv) AS BIGINT) AS c_tv
      FROM tv0 CROSS JOIN wdt GROUP BY 1, 2)"""


def _capped_tv(ev, max_grid: int = _ECDF_MAX_GRID):
    """Exact (event_type, vc, c_tv) counts with the grid hard-bounded
    at ``max_grid`` distinct centi-values — the shared base of
    q_ks_drift / q_earth_movers / q_mann_whitney and the Spark twin
    of _CAPPED_TV_CTE (bit-identical arithmetic: integer ceil-div
    width, left-edge modulo quantization, exact int64 re-sums).

    The width decision is a driver-side 1-row probe on the already-
    checkpointed aggregate (BOUNDED collect: exactly one row of three
    scalars — the same idiom as operators/drift.py
    _bounded_value_frame), so in the common width=1 regime the
    function returns tv0 itself: no second localCheckpoint, no
    broadcast exchange, no identity re-aggregation. That overhead is
    what regressed q_ks_drift 1.54x in r10 (VERDICT #3). The oracle
    CTE keeps its declarative width-1 branch — an identity
    re-aggregation over (event_type, vc) groups, so both engines
    still agree row-for-row in BOTH regimes. Returned frame is
    localCheckpointed either way (every caller fans it out to 2-3
    consumers that would otherwise each replay the scan).

    Returns ``(tv, big_n)``: the probe reads sum(c_tv) for free
    (re-quantization preserves it), so consumers inject the grand
    total as a literal instead of running a whole-frame
    ``Window.partitionBy()`` pass over the grid."""
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    tv0 = c.groupBy("event_type", "vc").agg(F.count(F.lit(1)).alias("c_tv"))
    # lazy: the probe collect below is the first consumer and
    # materializes the blocks in-line (one job instead of two)
    tv0 = tv0.localCheckpoint(eager=False)
    stats = tv0.agg(
        F.countDistinct("vc").alias("n_vals"),
        F.min("vc").alias("lo"),
        F.max("vc").alias("hi"),
        F.sum("c_tv").alias("big_n"),
    ).collect()[0]
    if not stats.n_vals or stats.n_vals <= max_grid:
        # width 1: the oracle's re-aggregation is an identity.
        # `or 0`: SUM over zero rows is NULL — an empty/all-NULL
        # events table must return the empty frame, not TypeError
        return tv0, int(stats.big_n or 0)
    # integer ceil-div width, exactly _CAPPED_TV_CTE's expression
    w = max((stats.hi - stats.lo + max_grid - 1) // max_grid, 1)
    tv = (
        tv0.select(
            "event_type",
            # vc - ((vc - lo) % w) == lo + ((vc - lo) div w) * w,
            # in EXACT int64 (no double division)
            (
                F.col("vc") - ((F.col("vc") - F.lit(stats.lo)) % F.lit(w))
            ).alias("vc"),
            "c_tv",
        )
        .groupBy("event_type", "vc")
        .agg(F.sum("c_tv").alias("c_tv"))
        .localCheckpoint(eager=False)
    )
    return tv, int(stats.big_n)


def _pooled_ecdf_frame(ev, max_grid: int = _ECDF_MAX_GRID):
    """Shared frame of q_ks_drift / q_earth_movers (both derive from
    sup/integral of |F_t − F_p| over the pooled step grid): per
    (event_type, pooled distinct centi-value) row carrying the type's
    cumulative count, the pooled cumulative, and both totals — exact
    int64 throughout. The aggregated (type, value) frame is
    localCheckpointed because it feeds THREE consumers (pooled
    marginal, per-type totals, the evaluation grid); without the cut
    each consumer replays the full events scan (measured: 3 scans).
    Grid size is types × distinct values — bounded by the VALUE
    DOMAIN, not the row count, and HARD-bounded by ``max_grid`` via
    _capped_tv, whose conditional equal-width re-quantization the
    oracles mirror verbatim (_CAPPED_TV_CTE), so cross-engine hash
    parity holds in BOTH regimes. Counts stay exact int64 either way;
    only the evaluation grid coarsens (KS/EMD evaluated at <=
    max_grid step points — the standard binned-ECDF regime)."""
    tv, big_n = _capped_tv(ev, max_grid)
    vals = tv.groupBy("vc").agg(F.sum("c_tv").alias("c_v"))
    w_vc = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pooled = vals.select(
        "vc",
        F.sum("c_v").over(w_vc).alias("cum_all"),
        # grand total from the _capped_tv probe — saves a whole-frame
        # Window.partitionBy() pass over the grid
        F.lit(big_n).cast("bigint").alias("big_n"),
    )
    types = tv.groupBy("event_type").agg(F.sum("c_tv").alias("n_t"))
    grid = pooled.crossJoin(F.broadcast(types))
    return grid.join(tv, ["event_type", "vc"], "left").withColumn(
        "cum_t",
        F.sum(F.coalesce(F.col("c_tv"), F.lit(0))).over(
            Window.partitionBy("event_type")
            .orderBy("vc")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )



@register(
    "q_ks_drift",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    {_CAPPED_TV_CTE},
    vals AS (SELECT vc, CAST(sum(c_tv) AS BIGINT) AS c_v FROM tv GROUP BY vc),
    pooled AS (
      SELECT vc, sum(c_v) OVER (ORDER BY vc) AS cum_all,
             (SELECT sum(c_v) FROM vals) AS big_n
      FROM vals),
    types AS (
      SELECT event_type, CAST(sum(c_tv) AS BIGINT) AS n_t
      FROM tv GROUP BY event_type),
    ft AS (
      SELECT g.event_type, g.n_t, g.cum_all, g.big_n,
             sum(COALESCE(tv.c_tv, 0))
               OVER (PARTITION BY g.event_type ORDER BY g.vc) AS cum_t
      FROM (SELECT t.event_type, t.n_t, p.vc, p.cum_all, p.big_n
            FROM types t CROSS JOIN pooled p) g
      LEFT JOIN tv ON tv.event_type = g.event_type AND tv.vc = g.vc)
    SELECT event_type, n_t AS n,
           round(max(abs(CAST(cum_t AS DOUBLE) / n_t
                         - CAST(cum_all AS DOUBLE) / big_n)), 6) AS d_stat
    FROM ft GROUP BY event_type, n_t ORDER BY event_type
    """,
    doc="Two-sample Kolmogorov-Smirnov drift per event_type vs the "
    "pooled value distribution — the classic CONTINUOUS-distribution "
    "drift statistic, complementing PSI (binned) and chi² "
    "(categorical): D_t = sup_x |F_t(x) − F_pooled(x)|. Both ECDFs "
    "are right-continuous step functions constant between pooled "
    "data points, so the supremum over the reals equals the max over "
    "the distinct pooled values evaluated AT those points — no left "
    "limits needed. Counts aggregate in ONE (type, value) shuffle; "
    "the grid is types × distinct centi-unit values (bounded by the "
    "VALUE DOMAIN, not the row count — at 100 TB with unbounded-"
    "cardinality values you'd quantize first, exactly the PSI "
    "bucketing), cumulated per type by one window. Cumulative counts "
    "stay exact int64; the two divisions, subtraction, abs and max "
    "are the identical IEEE sequence both engines; round(6) absorbs "
    "nothing but is kept for house style.",
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ft = _pooled_ecdf_frame(ev)
    d = F.abs(
        F.col("cum_t").cast("double") / F.col("n_t")
        - F.col("cum_all").cast("double") / F.col("big_n")
    )
    return (
        ft.groupBy("event_type", F.col("n_t").alias("n"))
        .agg(F.round(F.max(d), 6).alias("d_stat"))
        .orderBy("event_type")
    )


@register(
    "q_benford_deviation",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM events
      WHERE floor(value * 100 + 0.5) >= 1),
    o AS (
      SELECT event_type, d, CAST(count(*) AS BIGINT) AS c
      FROM c GROUP BY event_type, d),
    grid AS (
      SELECT t.event_type, CAST(g.d AS BIGINT) AS d
      FROM (SELECT DISTINCT event_type FROM c) t
      CROSS JOIN (SELECT unnest(range(1, 10)) AS d) g),
    f AS (
      SELECT grid.event_type, grid.d,
             COALESCE(o.c, 0) AS c
      FROM grid LEFT JOIN o
        ON o.event_type IS NOT DISTINCT FROM grid.event_type
       AND o.d = grid.d),
    n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_t
          FROM f GROUP BY event_type)
    SELECT f.event_type, n.n_t AS n,
           round(max(abs(CAST(c AS DOUBLE) / n.n_t
                         - log10(1.0 + 1.0 / d))), 6) AS max_abs_dev,
           round(sum(abs(CAST(c AS DOUBLE) / n.n_t
                         - log10(1.0 + 1.0 / d))), 6) AS total_abs_dev
    FROM f JOIN n ON n.event_type IS NOT DISTINCT FROM f.event_type
    GROUP BY f.event_type, n.n_t
    ORDER BY f.event_type
    """,
    doc="Benford first-digit deviation per event_type: compare each "
    "slice's leading-digit distribution (of the exact centi-unit "
    "int64) against Benford's law log10(1+1/d) — the classic "
    "synthetic/fabricated-numeric-data detector a corpus-quality "
    "pass runs on numeric columns. The first digit comes from the "
    "decimal string of an exact integer (portable, no float log "
    "thresholds); digits a slice never produced still contribute "
    "|0 - e_d| via a 9-row digit grid per type (generated from the "
    "aggregated type list, never a scan). One (type, digit) groupBy "
    "shuffle; everything after runs on <= 9x|types| rows. round(6) "
    "absorbs summation-order ulps.",
)
def q_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    c = ev.select(
        "event_type",
        F.substring(vc.cast("string"), 1, 1).cast("bigint").alias("d"),
    ).where(vc >= 1)
    o = c.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    digits = spark.range(1, 10).select(F.col("id").alias("d"))
    grid = c.select("event_type").distinct().crossJoin(F.broadcast(digits))
    # null-SAFE join: distinct() keeps a NULL event_type slice in the
    # grid, so the counts must re-attach to it too — a plain equi-join
    # left every digit of the NULL slice at c=0, making n_t = 0 and
    # the deviation division throw under ANSI (r14 fuzz, nullkeys);
    # the oracle joins IS NOT DISTINCT FROM identically
    f = grid.join(
        o,
        grid["event_type"].eqNullSafe(o["event_type"])
        & (grid["d"] == o["d"]),
        "left",
    ).select(
        grid["event_type"],
        grid["d"],
        F.coalesce(o["c"], F.lit(0)).alias("c"),
    )
    w_t = Window.partitionBy("event_type")
    f = f.withColumn("n_t", F.sum("c").over(w_t))
    dev = F.abs(
        F.col("c").cast("double") / F.col("n_t")
        - F.log10(1.0 + 1.0 / F.col("d"))
    )
    return (
        f.groupBy("event_type", "n_t")
        .agg(
            F.round(F.max(dev), 6).alias("max_abs_dev"),
            F.round(F.sum(dev), 6).alias("total_abs_dev"),
        )
        .select(
            "event_type", F.col("n_t").alias("n"), "max_abs_dev", "total_abs_dev"
        )
        .orderBy("event_type")
    )


@register(
    "q_mutual_information",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
      FROM documents GROUP BY lang, source),
    r AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rt FROM o GROUP BY lang),
    s AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY source),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS big_n FROM o),
    hl AS (SELECT sum(-(CAST(rt AS DOUBLE) / n.big_n)
                      * ln(CAST(rt AS DOUBLE) / n.big_n)) AS h_lang
           FROM r CROSS JOIN n),
    hs AS (SELECT sum(-(CAST(ct AS DOUBLE) / n.big_n)
                      * ln(CAST(ct AS DOUBLE) / n.big_n)) AS h_src
           FROM s CROSS JOIN n),
    mi AS (
      SELECT sum((CAST(obs AS DOUBLE) / n.big_n)
                 * ln((CAST(obs AS DOUBLE) * n.big_n)
                      / (CAST(r.rt AS DOUBLE) * s.ct))) AS mi
      FROM o
      JOIN r ON r.lang = o.lang
      JOIN s ON s.source = o.source
      CROSS JOIN n)
    SELECT n.big_n AS n,
           round(hl.h_lang, 6) AS h_lang,
           round(hs.h_src, 6) AS h_source,
           round(mi.mi, 6) AS mi,
           round(mi.mi / sqrt(hl.h_lang * hs.h_src), 6) AS nmi
    FROM mi CROSS JOIN hl CROSS JOIN hs CROSS JOIN n
    """,
    doc="Mutual information between language and source (+ marginal "
    "entropies and sqrt-normalized NMI): the association-STRENGTH "
    "companion to q_chi2_drift's independence test — 'how much does "
    "knowing the source tell you about the language of a document', "
    "the partition-correlation diagnostic for stratified sampling "
    "(high NMI ⇒ lang strata and source strata are redundant). Only "
    "observed cells contribute (0·ln0 = 0 exactly), so no empty-cell "
    "handling at all; counts are exact int64, each term a fixed "
    "double op sequence, round(6) absorbs summation order. Same ONE "
    "(lang, source) shuffle as chi2; everything after is O(langs + "
    "sources) rows.",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    # O(langs x sources) frame feeds FOUR consumers (cells + both
    # marginals + totals): cut it or each one replays the corpus scan
    # (the q_cramers_v idiom; un-cut, the final plan ran 4 scans,
    # r14). Lazy (r15): same LogicalRDD cut, no separate eager job.
    o = o.localCheckpoint(eager=False)
    r = o.groupBy("lang").agg(F.sum("obs").alias("rt"))
    s = o.groupBy("source").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").alias("big_n"))
    big_n = F.col("big_n")
    h_lang = r.crossJoin(F.broadcast(n)).agg(
        F.sum(
            -(F.col("rt").cast("double") / big_n)
            * F.log(F.col("rt").cast("double") / big_n)
        ).alias("h_lang")
    )
    h_src = s.crossJoin(F.broadcast(n)).agg(
        F.sum(
            -(F.col("ct").cast("double") / big_n)
            * F.log(F.col("ct").cast("double") / big_n)
        ).alias("h_src")
    )
    mi = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                (F.col("obs").cast("double") / big_n)
                * F.log(
                    (F.col("obs").cast("double") * big_n)
                    / (F.col("rt").cast("double") * F.col("ct"))
                )
            ).alias("mi")
        )
    )
    return (
        mi.crossJoin(F.broadcast(h_lang))
        .crossJoin(F.broadcast(h_src))
        .crossJoin(F.broadcast(n))
        .select(
            big_n.alias("n"),
            F.round("h_lang", 6).alias("h_lang"),
            F.round("h_src", 6).alias("h_source"),
            F.round("mi", 6).alias("mi"),
            F.round(
                F.col("mi") / F.sqrt(F.col("h_lang") * F.col("h_src")), 6
            ).alias("nmi"),
        )
    )


@register(
    "q_js_divergence",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    ext AS (SELECT min(vc) AS lo, max(vc) AS hi FROM c),
    b AS (
      SELECT c.event_type,
             CASE WHEN ext.hi > ext.lo
                  THEN least(((c.vc - ext.lo) * {_PSI_BUCKETS})
                             // (ext.hi - ext.lo), {_PSI_BUCKETS - 1})
                  ELSE 0 END AS bucket
      FROM c, ext),
    tb AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c_tb
      FROM b GROUP BY event_type, bucket),
    tot AS (
      SELECT event_type, CAST(sum(c_tb) AS BIGINT) AS n_t
      FROM tb GROUP BY event_type),
    bk AS (
      SELECT bucket, CAST(sum(c_tb) AS BIGINT) AS c_b
      FROM tb GROUP BY bucket),
    n AS (SELECT CAST(sum(c_tb) AS BIGINT) AS big_n FROM tb),
    grid AS (
      SELECT t.event_type, t.n_t, bk.bucket, bk.c_b, n.big_n
      FROM tot t CROSS JOIN bk CROSS JOIN n),
    j AS (
      SELECT g.event_type, g.n_t,
             CAST(COALESCE(tb.c_tb, 0) AS DOUBLE) / g.n_t AS p,
             CAST(g.c_b AS DOUBLE) / g.big_n AS q
      FROM grid g
      LEFT JOIN tb ON tb.event_type = g.event_type
                  AND tb.bucket = g.bucket)
    SELECT event_type, CAST(n_t AS BIGINT) AS n,
           round(sum(
             CASE WHEN p > 0
                  THEN 0.5 * p * ln(2.0 * p / (p + q)) ELSE 0.0 END
             + 0.5 * q * ln(2.0 * q / (p + q))), 6) AS js
    FROM j GROUP BY event_type, n_t ORDER BY event_type
    """,
    doc="Jensen-Shannon divergence per event_type vs the pooled value "
    "distribution — the BOUNDED, symmetric member of the divergence "
    "family (PSI is unbounded and blows up on vanishing buckets; JS "
    "is always in [0, ln 2] and defined for any pair of histograms, "
    "so it is the score you can threshold uniformly across slices). "
    "Same exact-int64 10-bucket frame as q_psi_drift; the per-type "
    "evaluation grid is types x ACTIVE buckets (<= types x 10 rows, "
    "the q_benford_deviation constant-grid pattern) so pooled-only "
    "buckets contribute their q-side term with p = 0 (0 ln 0 = 0, "
    "dropped exactly; the mixture m = (p+q)/2 > 0 whenever either "
    "side has mass). One (type, bucket) shuffle over the scan; "
    "round(6) absorbs summation-order ulps. 100 TB: identical shape "
    "to q_psi_drift — one scan + one tiny shuffle.",
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    B = _PSI_BUCKETS
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    ext = c.agg(F.min("vc").alias("lo"), F.max("vc").alias("hi"))
    b = c.crossJoin(F.broadcast(ext)).select(
        "event_type",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.expr(f"((vc - lo) * {B}) div (hi - lo)"),
                F.lit(B - 1).cast("bigint"),
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("bucket"),
    )
    tb = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("c_tb")
    )
    # 3 consumers: totals, pooled, grid join (lazy cut — r15)
    tb = tb.localCheckpoint(eager=False)
    tot = tb.groupBy("event_type").agg(F.sum("c_tb").alias("n_t"))
    bk = tb.groupBy("bucket").agg(F.sum("c_tb").alias("c_b"))
    n = tb.agg(F.sum("c_tb").alias("big_n"))
    grid = (
        tot.crossJoin(F.broadcast(bk)).crossJoin(F.broadcast(n))
    )
    j = grid.join(tb, ["event_type", "bucket"], "left").select(
        "event_type",
        "n_t",
        (
            F.coalesce(F.col("c_tb"), F.lit(0)).cast("double") / F.col("n_t")
        ).alias("p"),
        (F.col("c_b").cast("double") / F.col("big_n")).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    term = (
        F.when(p > 0, 0.5 * p * F.log(2.0 * p / (p + q))).otherwise(0.0)
        + 0.5 * q * F.log(2.0 * q / (p + q))
    )
    return (
        j.groupBy("event_type", F.col("n_t").cast("bigint").alias("n"))
        .agg(F.round(F.sum(term), 6).alias("js"))
        .orderBy("event_type")
    )


@register(
    "q_earth_movers",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    {_CAPPED_TV_CTE},
    vals AS (SELECT vc, CAST(sum(c_tv) AS BIGINT) AS c_v FROM tv GROUP BY vc),
    pooled AS (
      SELECT vc, sum(c_v) OVER (ORDER BY vc) AS cum_all,
             (SELECT sum(c_v) FROM vals) AS big_n
      FROM vals),
    types AS (
      SELECT event_type, CAST(sum(c_tv) AS BIGINT) AS n_t
      FROM tv GROUP BY event_type),
    ft AS (
      SELECT g.event_type, g.n_t, g.vc, g.cum_all, g.big_n,
             sum(COALESCE(tv.c_tv, 0))
               OVER (PARTITION BY g.event_type ORDER BY g.vc) AS cum_t,
             lead(g.vc)
               OVER (PARTITION BY g.event_type ORDER BY g.vc) AS next_vc
      FROM (SELECT t.event_type, t.n_t, p.vc, p.cum_all, p.big_n
            FROM types t CROSS JOIN pooled p) g
      LEFT JOIN tv ON tv.event_type = g.event_type AND tv.vc = g.vc)
    SELECT event_type, n_t AS n,
           round(sum(abs(CAST(cum_t AS DOUBLE) / n_t
                         - CAST(cum_all AS DOUBLE) / big_n)
                     * (next_vc - vc)) / 100.0, 6) AS emd
    FROM ft WHERE next_vc IS NOT NULL
    GROUP BY event_type, n_t ORDER BY event_type
    """,
    doc="1-D earth mover's (Wasserstein-1) distance per event_type vs "
    "the pooled value distribution — the third member of the distance "
    "trio: KS reports the WORST ECDF gap, JS the information "
    "divergence, EMD the total transport COST IN VALUE UNITS ('how "
    "far, on average, must mass move'), the one that scales with "
    "shift magnitude where KS saturates. Closed form in 1-D: "
    "EMD = ∫|F_t − F_p| dx = Σ_i |F_t(v_i) − F_p(v_i)|·(v_{i+1} − "
    "v_i) over the sorted pooled grid (both ECDFs constant between "
    "points — the same step-function reduction as q_ks_drift, whose "
    "exact int64 cumulative-count frame this reuses verbatim, plus "
    "one lead() for the gap; /100 converts centi-units back). Same "
    "plan: ONE (type, value) shuffle, checkpointed aggregated frame, "
    "grid bounded by the value domain. round(6) absorbs "
    "summation-order ulps.",
)
def q_earth_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ft = _pooled_ecdf_frame(ev).withColumn(
        "next_vc",
        F.lead("vc").over(Window.partitionBy("event_type").orderBy("vc")),
    )
    term = (
        F.abs(
            F.col("cum_t").cast("double") / F.col("n_t")
            - F.col("cum_all").cast("double") / F.col("big_n")
        )
        * (F.col("next_vc") - F.col("vc"))
    )
    return (
        ft.where(F.col("next_vc").isNotNull())
        .groupBy("event_type", F.col("n_t").alias("n"))
        .agg(F.round(F.sum(term) / 100.0, 6).alias("emd"))
        .orderBy("event_type")
    )


# --- round-10 statistical-QA family ---------------------------------------

@register(
    "q_cramers_v",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source),
    r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY lang),
    s AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY source),
    n AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT lang) AS BIGINT) AS nr,
             CAST(count(DISTINCT source) AS BIGINT) AS nc
      FROM o),
    t AS (
      SELECT n.n, n.nr, n.nc,
             n.n + sum((o.o - CAST(r.rt AS DOUBLE) * s.ct / n.n)
                       * (o.o - CAST(r.rt AS DOUBLE) * s.ct / n.n)
                       / (CAST(r.rt AS DOUBLE) * s.ct / n.n)
                       - CAST(r.rt AS DOUBLE) * s.ct / n.n) AS chi2
      FROM o JOIN r USING (lang) JOIN s USING (source) CROSS JOIN n
      GROUP BY n.n, n.nr, n.nc)
    SELECT n, nr AS n_langs, nc AS n_sources,
           (nr - 1) * (nc - 1) AS dof,
           round(chi2, 6) AS chi2,
           CASE WHEN least(nr, nc) > 1 THEN
             round(sqrt(chi2 / (n * (least(nr, nc) - 1))), 6)
           END AS cramers_v
    FROM t
    """,
    doc="Cramér's V association between the corpus's lang and source "
    "columns — the NORMALIZED companion of q_chi2_drift: chi² grows "
    "with N (every chi² on big data is 'significant'), while "
    "V = sqrt(chi²/(N·(min(r,c)−1))) ∈ [0, 1] answers the curation "
    "question that actually matters — HOW MUCH does source determine "
    "language (mix-balance audits, leakage checks between splits). "
    "Unobserved cells fold in via the sum_all(e) = N identity (the "
    "q_chi2_drift trick), so the grid is observed cells only. One "
    "(lang, source) groupBy shuffle; marginals broadcast back onto "
    "the aggregated O(langs × sources) frame; round(6) absorbs "
    "summation-order ulps. 100 TB: identical shape to q_chi2_drift.",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    # O(langs x sources) frame feeds FOUR consumers (cells + both
    # marginals + totals): cut it or each one replays the corpus scan
    # (lazy cut — r15: same LogicalRDD boundary, no separate job)
    o = o.localCheckpoint(eager=False)
    r = o.groupBy("lang").agg(F.sum("o").alias("rt"))
    s = o.groupBy("source").agg(F.sum("o").alias("ct"))
    n = o.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").alias("nr"),
        F.countDistinct("source").alias("nc"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e - e
    t = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(n))
        .groupBy("n", "nr", "nc")
        .agg((F.col("n") + F.sum(term)).alias("chi2"))
    )
    return t.select(
        F.col("n").cast("long").alias("n"),
        F.col("nr").cast("long").alias("n_langs"),
        F.col("nc").cast("long").alias("n_sources"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        # a single-language (or single-source) corpus makes V's
        # denominator 0: NULL-gate symmetrically (the q_levene SSW
        # contract) instead of NULL-vs-Infinity cross-engine drift
        F.when(
            F.least("nr", "nc") > 1,
            F.round(
                F.sqrt(
                    F.col("chi2") / (F.col("n") * (F.least("nr", "nc") - 1))
                ),
                6,
            ),
        ).alias("cramers_v"),
    )


@register(
    "q_levene_variance",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT event_type, vc,
             CAST(count(*) OVER win AS BIGINT) AS n_t,
             CAST(sum(vc) OVER win AS BIGINT) AS s_t
      FROM c WINDOW win AS (PARTITION BY event_type)),
    z AS (
      SELECT event_type, n_t,
             CAST(abs(n_t * vc - s_t) AS DOUBLE) / (100.0 * n_t) AS z
      FROM w),
    t AS (
      SELECT event_type,
             CAST(max(n_t) AS BIGINT) AS n_t,
             avg(z) AS zbar_t,
             (max(n_t) - 1) * var_samp(z) AS ssw_t
      FROM z GROUP BY event_type),
    g AS (
      SELECT CAST(sum(n_t) AS BIGINT) AS big_n,
             CAST(count(*) AS BIGINT) AS k,
             sum(n_t * zbar_t) / sum(n_t) AS zbar
      FROM t)
    SELECT g.big_n AS n, g.k AS k,
           CASE WHEN g.k > 1 AND sum(t.ssw_t) > 0 THEN
             round(CAST(g.big_n - g.k AS DOUBLE) / (g.k - 1)
                   * sum(t.n_t * (t.zbar_t - g.zbar) * (t.zbar_t - g.zbar))
                   / sum(t.ssw_t), 6) END AS w_stat
    FROM t CROSS JOIN g
    GROUP BY g.big_n, g.k
    """,
    doc="Levene's test statistic for variance homogeneity across "
    "event_types (mean-centered form): PSI/KS/CUSUM detect LOCATION "
    "drift; Levene W detects DISPERSION drift — a slice whose mean "
    "holds but whose spread doubles (sensor degradation, mixed "
    "traffic) passes every mean-based monitor and fails this one. "
    "z_ij = |x_ij − mean_i| derives from the EXACT int64 cross "
    "product |n_i·vc_ij − s_i| (one division per row, identical IEEE "
    "both engines; n·vc bounded by rows/slice × centi-domain — "
    "DECIMAL territory only past ~1e9 rows/slice × 1e9 centi-values); "
    "W = ((N−k)/(k−1))·Σn_i(z̄_i−z̄)² / ΣΣ(z_ij−z̄_i)². ONE "
    "event_type-keyed shuffle: the totals ride whole-partition "
    "windows on the same keying, the per-type agg reuses it, and the "
    "k-row frame joins a 1-row broadcast. round(6) absorbs var_samp "
    "merge-order ulps. 100 TB: one scan + one keyed shuffle.",
)
def q_levene_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    w_all = Window.partitionBy("event_type")
    w = c.withColumns(
        {
            "n_t": F.count(F.lit(1)).over(w_all),
            "s_t": F.sum("vc").over(w_all),
        }
    )
    z = w.select(
        "event_type",
        "n_t",
        (
            F.abs(F.col("n_t") * F.col("vc") - F.col("s_t")).cast("double")
            / (F.lit(100.0) * F.col("n_t"))
        ).alias("z"),
    )
    t = z.groupBy("event_type").agg(
        F.max("n_t").cast("long").alias("n_t"),
        F.avg("z").alias("zbar_t"),
        ((F.max("n_t") - 1) * F.var_samp("z")).alias("ssw_t"),
    )
    # k-row frame feeds two consumers (grand means + the W terms):
    # cut it or both replay the scan-and-window stage (lazy — r15)
    t = t.localCheckpoint(eager=False)
    g = t.agg(
        F.sum("n_t").cast("long").alias("big_n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        (F.sum(F.col("n_t") * F.col("zbar_t")) / F.sum("n_t")).alias("zbar"),
    )
    ssb = F.col("n_t") * (F.col("zbar_t") - F.col("zbar")) * (
        F.col("zbar_t") - F.col("zbar")
    )
    return (
        t.crossJoin(F.broadcast(g))
        .groupBy(F.col("big_n").alias("n"), "k")
        .agg(
            # inapplicable cases NULL-gate EXPLICITLY and symmetrically
            # (DuckDB CASE mirrors both): k = 1 (the (k-1) denominator
            # is 0 — both engines happen to NULL here, but the gate
            # makes the contract explicit rather than an artifact of
            # non-ANSI division) and every-group-constant |dev|
            # (SSW = 0, W undefined); read k to tell them apart
            F.when(
                (F.col("k") > 1) & (F.sum("ssw_t") > 0),
                F.round(
                    (F.col("n").cast("double") - F.col("k"))
                    / (F.col("k") - 1)
                    * F.sum(ssb)
                    / F.sum("ssw_t"),
                    6,
                ),
            ).alias("w_stat")
        )
    )


@register(
    "q_grubbs_outlier",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    t AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(greatest(CAST(count(*) AS BIGINT) * max(vc) - sum(vc),
                           sum(vc) - CAST(count(*) AS BIGINT) * min(vc))
                  AS DOUBLE) / (100.0 * count(*)) AS max_dev,
             stddev_samp(CAST(vc AS DOUBLE) / 100.0) AS sd
      FROM c GROUP BY event_type)
    SELECT event_type, n,
           round(max_dev, 6) AS outlier_dev,
           round(max_dev / sd, 6) AS g_stat
    FROM t WHERE n >= 3 AND sd > 0 ORDER BY event_type
    """,
    doc="Grubbs' outlier statistic per event_type: G = max|x − mean| "
    "/ s — the studentized extreme deviation, the classic "
    "single-outlier screen for ingest QA (a G far above the critical "
    "value ~ sqrt(n) flags a corrupt reading / unit error in a slice "
    "whose aggregate stats still look sane). max|x − mean| equals "
    "greatest(max − mean, mean − min) — the extreme deviation is "
    "always AT an extreme value — so the whole statistic is ONE "
    "plain groupBy aggregate (the r10 self-review removed the "
    "per-row window pass: a skewed hot slice no longer funnels "
    "through one window task, and map-side partials shrink every "
    "partition before the shuffle). The deviation derives from the "
    "EXACT int64 cross products n·max(vc) − s and s − n·min(vc) "
    "(the q_levene_variance scaling) with one identical-IEEE "
    "division; stddev_samp is the q_agg_stats-proven parity "
    "aggregate. n >= 3 and sd > 0 gate the undefined cases "
    "symmetrically. round(6).",
)
def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    n_l = F.count(F.lit(1)).cast("bigint")
    t = c.groupBy("event_type").agg(
        n_l.alias("n"),
        (
            F.greatest(
                n_l * F.max("vc") - F.sum("vc"),
                F.sum("vc") - n_l * F.min("vc"),
            ).cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)))
        ).alias("max_dev"),
        F.stddev_samp(F.col("vc").cast("double") / 100.0).alias("sd"),
    )
    return (
        t.where((F.col("n") >= 3) & (F.col("sd") > 0))
        .select(
            "event_type",
            "n",
            F.round("max_dev", 6).alias("outlier_dev"),
            F.round(F.col("max_dev") / F.col("sd"), 6).alias("g_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "q_user_type_entropy",
    oracle="""
    WITH ut AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type),
    p AS (
      SELECT user_id, c,
             CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS n_u
      FROM ut),
    u AS (
      SELECT user_id,
             CAST(max(n_u) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             -sum((CAST(c AS DOUBLE) / n_u) * ln(CAST(c AS DOUBLE) / n_u))
               AS h
      FROM p GROUP BY user_id)
    SELECT user_id, n_events, n_types,
           round(h, 6) AS entropy,
           CASE WHEN n_types > 1 THEN round(h / ln(CAST(n_types AS DOUBLE)), 6)
                ELSE 0.0 END AS norm_entropy
    FROM u ORDER BY user_id
    """,
    doc="Shannon entropy of each user's event_type mix plus the "
    "normalized form H/ln(k) ∈ [0, 1] — the behavioral-diversity "
    "profile: norm 0 = single-type bots / stuck clients, norm ~1 = "
    "uniform usage; the per-entity analog of q_char_entropy (which "
    "profiles text) and the feature that stratifies users for "
    "sampling the way q_lang_source_stats stratifies documents. One "
    "(user, type) groupBy shuffle, then the per-user agg rides the "
    "same user keying (types/user is enumerable, so the inner frame "
    "is O(users × types)). Entropy sums <= types-per-user terms — "
    "round(6) absorbs ordering ulps; norm divides the UNROUNDED H. "
    "100 TB: one scan + one keyed shuffle.",
)
def q_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_u = Window.partitionBy("user_id")
    p = F.col("c").cast("double") / F.sum("c").over(w_u)
    u = ut.select(
        "user_id", F.col("c"), (-p * F.log(p)).alias("term")
    ).groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("term").alias("h"),
    )
    return u.select(
        "user_id",
        "n_events",
        "n_types",
        F.round("h", 6).alias("entropy"),
        F.when(
            F.col("n_types") > 1,
            F.round(F.col("h") / F.log(F.col("n_types").cast("double")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    ).orderBy("user_id")


@register(
    "q_mann_whitney",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    {_CAPPED_TV_CTE},
    vals AS (SELECT vc, CAST(sum(c_tv) AS BIGINT) AS c_v FROM tv GROUP BY vc),
    pooled AS (
      SELECT vc, c_v, sum(c_v) OVER (ORDER BY vc) AS cum_all,
             (SELECT sum(c_v) FROM vals) AS big_n
      FROM vals),
    r AS (
      SELECT tv.event_type,
             CAST(sum(tv.c_tv) AS BIGINT) AS n_t,
             CAST(sum(tv.c_tv * (2 * p.cum_all - p.c_v + 1)) AS BIGINT)
               AS two_r,
             CAST(max(p.big_n) AS BIGINT) AS big_n
      FROM tv JOIN pooled p USING (vc)
      GROUP BY tv.event_type)
    SELECT event_type, n_t AS n, big_n - n_t AS m,
           two_r - n_t * (n_t + 1) AS u2,
           round(CAST(two_r - n_t * (n_t + 1) AS DOUBLE)
                 / (2.0 * n_t * (big_n - n_t)), 6) AS auc
    FROM r WHERE big_n > n_t ORDER BY event_type
    """,
    doc="Mann–Whitney U (rank-sum) per event_type vs the REST of the "
    "pooled distribution — the nonparametric location test that "
    "completes the drift family's rank column: KS is the sup-gap, "
    "EMD the transport cost, U/auc the PROBABILITY a random value "
    "from the slice exceeds a random value from everything else "
    "(AUC 0.5 = no shift; it is also exactly ROC-AUC of the slice "
    "indicator, the score every binary-drift classifier reports). "
    "Average ranks with tie handling stay EXACT int64: 2·R_t = "
    "Σ c_tv·(2·cum_all − c_v + 1) over the pooled step grid (the "
    "q_ks_drift cumulative-count frame), then U = R − n(n+1)/2 and "
    "AUC = U/(n·m) is one double division — identical IEEE both "
    "engines, round(6) for house style. The int64 rank sum is exact "
    "to 2^63 ~ one slice of ~3e9 rows over a 3e9-row pool; past that "
    "use operators/statqa.mann_whitney_by_slice, which accumulates "
    "2R in DECIMAL(38,0) (the driver hash needs BIGINT output, so "
    "the registry form keeps int64 with this documented bound). Ranks in the pooled ordering "
    "equal ranks in slice-vs-rest (pooled = union), so no second "
    "pass. ONE (type, value) shuffle over the shared _capped_tv "
    "base, so the _ECDF_MAX_GRID hard cap applies here identically "
    "(and the oracle carries the same conditional quantization CTE, "
    "so parity holds even when the cap fires). 100 TB: the "
    "q_ks_drift plan exactly.",
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # shared capped base of the ECDF family: exact counts, grid
    # hard-bounded at _ECDF_MAX_GRID, checkpointed (2 consumers here)
    tv, big_n = _capped_tv(ev)
    vals = tv.groupBy("vc").agg(F.sum("c_tv").alias("c_v"))
    w_vc = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pooled = vals.select(
        "vc",
        "c_v",
        F.sum("c_v").over(w_vc).alias("cum_all"),
        # grand total from the _capped_tv probe — saves a whole-frame
        # Window.partitionBy() pass over the grid
        F.lit(big_n).cast("bigint").alias("big_n"),
    )
    r = (
        tv.join(pooled, "vc")
        .groupBy("event_type")
        .agg(
            F.sum("c_tv").cast("long").alias("n_t"),
            F.sum(
                F.col("c_tv")
                * (2 * F.col("cum_all") - F.col("c_v") + 1)
            )
            .cast("long")
            .alias("two_r"),
            F.max("big_n").cast("long").alias("big_n"),
        )
    )
    u2 = F.col("two_r") - F.col("n_t") * (F.col("n_t") + 1)
    return (
        r.where(F.col("big_n") > F.col("n_t"))
        .select(
            "event_type",
            F.col("n_t").alias("n"),
            (F.col("big_n") - F.col("n_t")).alias("m"),
            u2.alias("u2"),
            F.round(
                u2.cast("double")
                / (2.0 * F.col("n_t") * (F.col("big_n") - F.col("n_t"))),
                6,
            ).alias("auc"),
        )
        .orderBy("event_type")
    )
