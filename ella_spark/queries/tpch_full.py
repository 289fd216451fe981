"""Remaining TPC-H query shapes (Q4, Q7, Q8, Q12, Q13, Q15, Q17, Q18,
Q19, Q21, Q22), adapted to the synthetic schema.

The reference inherits the full relational surface from DataFusion 27
(ella-engine/src/engine/state.rs:115-133) and its integration suite
exercises TPC-H-style multi-join/subquery plans; these queries complete
the classic decision-support matrix on the driver's tables. The
synthetic schema omits ``partsupp`` and several narrow columns
(commitdate/receiptdate/shipmode/phone/container), so predicates are
adapted while keeping each query's *plan shape* — the thing that
matters for Catalyst coverage — intact:

- Q4/Q21/Q22: (NOT) EXISTS correlated subqueries -> semi/anti joins
- Q7/Q8: multi-way join with two roles for one dim (nation n1/n2)
- Q13: outer join + two-level aggregate (distribution of counts)
- Q15: aggregate view joined against its own MAX (scalar subquery)
- Q17/Q18: correlated aggregate predicate / IN over grouped HAVING
- Q19: OR-of-ANDed-ranges pushed into one join

Scale notes: every join keys on the natural equi-key so Catalyst
shuffles on it; constant-size dims (nation/region) carry explicit
broadcast hints, SF-scaling tables (customer/supplier/part/orders/
lineitem) never do — AQE picks broadcast when a filtered side happens
to be small at the current SF, and falls back to shuffle joins at
100 TB where these sides are huge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ella_spark.queries import register
from ella_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join "
    "with a non-equi residual (l_shipdate > o_orderdate). The equi half "
    "of the condition drives the shuffle; the residual filters post-join.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    shipped_late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, CAST(round(sum(CAST(volume AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: one dim (nation) joined in two roles. "
    "r15 (guide §3.2): the OR'd nation-pair predicate implies BOTH "
    "sides' nations are in {NATION_1, NATION_2}, so supplier and "
    "customer are pre-filtered with broadcast LEFT SEMI joins on "
    "those 2 nation keys before any fact join — every downstream "
    "join carries only the ~2/25 of rows that can survive "
    "(scale-free); the diagonal filter (N1-N1/N2-N2) applies after "
    "the joins exactly as before. Catalyst cannot push the "
    "disjunction (it references both join branches), and semi-join "
    "(not a dim-join reorder) is essential: a joined-dims frame gets "
    "a PRODUCT size estimate that pushed the planner into "
    "broadcasting the FACT side (measured; the q5 prefilter pattern "
    "keeps the left's estimate).",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    pair_nations = ("NATION_1", "NATION_2")
    pair_keys = F.broadcast(
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair_nations))
        .select("n_nationkey")
    )
    s = s.join(pair_keys, s.s_nationkey == pair_keys.n_nationkey, "left_semi")
    c = c.join(pair_keys, c.c_nationkey == pair_keys.n_nationkey, "left_semi")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
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
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CAST(CASE WHEN nation = 'NATION_3' THEN volume
                             ELSE 0 END AS DECIMAL(28,8))) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(28,8))) AS DOUBLE), 6)
             AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: 7-way join, nation in two roles, conditional "
    "share-of-total aggregate. part/customer filters prune before the "
    "fact joins; region/nation broadcast. r15 (guide §3.2): the "
    "AMERICA region predicate reaches customer BEFORE the fact joins "
    "via a broadcast LEFT SEMI join on the AMERICA nation keys (the "
    "q5/q7 prefilter pattern — constant-size key frame, no product "
    "size estimate), so the orders⋈customer join and everything "
    "after it carries ~1/5 of the rows instead of filtering at the "
    "tail.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    america_keys = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(
            _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("am_key"))
    )
    c = c.join(america_keys, c.c_nationkey == F.col("am_key"), "left_semi")
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", volume)
                    .otherwise(0.0)
                    .cast("decimal(28,8)")
                ).cast("double")
                / F.sum(volume.cast("decimal(28,8)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q12_late_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape (shipmode column absent -> returnflag): "
    "fact-fact equi-join with a cross-table interval residual and "
    "priority-bucketed conditional counts.",
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy("l_returnflag")
        .agg(
            # DuckDB sums integers as HUGEINT (which pandas renders as
            # float); pin BIGINT on both sides so the driver's
            # dtype-sensitive hash compare cannot drift
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_cust_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: outer join with a join-side filter, then a "
    "two-level aggregate (orders per customer -> customers per count). "
    "count(o_orderkey) counts non-NULL only, so no-order customers land "
    "in the c_count=0 bucket.",
)
def q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: aggregate 'view' reused twice — once joined "
    "to supplier, once reduced to its MAX as a scalar subquery. The "
    "Spark plan cross-joins the 1-row max (broadcast) instead of "
    "recomputing per row.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    # the scalar MAX as a whole-frame window over the COMPACT revenue
    # aggregate (one row per supplier): one lineitem scan. The
    # aggregate-then-rejoin form re-built the revenue subtree — two
    # full fact scans (AQE granted it no exchange reuse). The single-
    # partition window touches only per-supplier rows, the standard
    # Q15 trade.
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    best = F.max("total_revenue").over(Window.partitionBy())
    return (
        revenue.withColumn("best", best)
        .where(F.col("total_revenue") == F.col("best"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
        )
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated aggregate predicate, decorrelated "
    "into a per-part avg aggregate joined back on partkey (the rewrite "
    "DataFusion/Catalyst both apply; here expressed directly).",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # ONE lineitem scan: join the (filtered, auto-broadcast) brand
    # parts first — pruning lineitem to the brand's lines — then the
    # correlated per-part average becomes a window over those lines.
    # The join keeps EVERY line of a qualifying part, so the window avg
    # equals the subquery's whole-table per-part avg. The former
    # aggregate-then-join form scanned the 100 TB fact table twice.
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    cutoff = (F.avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2)
    return (
        j.withColumn("qty_cutoff", cutoff)
        .where(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,8)"))
                .cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_cust",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 350)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery -> "
    "left-semi join against the aggregate, then the detail re-join "
    "and final rollup per order. r15 (guide §2.3 aggregate before "
    "you shuffle): the per-order qualifying sum IS the final "
    "sum_qty, so lineitem collapses to one declarative aggregate "
    "(map-side partial combine, ~4-7 lines per order merged before "
    "the exchange) BEFORE any join — the r14 window form shuffled "
    "every raw line, joined orders/customer per LINE, and re-summed "
    "through a final 5-wide-key (two strings) aggregate exchange. "
    "Exact: l_quantity is integral (<= 50), so double sums are "
    "order-independent. Joins now carry one row per qualifying "
    "order; the final aggregate is gone entirely.",
)
def q18_large_volume_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    liq = (
        li.select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot"))
        .where(F.col("tot") > 350)
    )
    return (
        liq.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("tot", 2).alias("sum_qty"),
        )
    )


@register(
    "q19_bracket_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34'
           AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: OR of ANDed range brackets spanning both join "
    "sides; the join stays an equi-join on partkey with the bracket "
    "disjunction as a residual filter.",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(bracket)
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
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_5'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (late := shipped >60d after order date — the "
    "schema has no receipt/commit dates): EXISTS + NOT EXISTS "
    "decorrelated into per-order supplier stats. An order qualifies "
    "when it has >=2 distinct suppliers but exactly one late one; "
    "each of that supplier's late lines counts, matching the "
    "correlated-EXISTS row semantics. One extra aggregate over "
    "lineitem replaces two correlated scans — at 100 TB the aggregate "
    "shuffles (orderkey, 2 counters) instead of re-scanning lineitem "
    "per outer row.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    n = F.broadcast(_t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")

    # ONE lineitem⋈orders pass: collapse to per-(order, supplier)
    # late-line counts, then derive the per-order supplier stats with a
    # window over that compact frame (rows = distinct (order, supplier)
    # pairs — orders-of-magnitude smaller than lineitem). The previous
    # form built the lineitem⋈orders join twice (once for the
    # qualifying-order aggregate, once for the late lines) — at 100 TB
    # that is two full fact-table joins instead of one.
    from pyspark.sql import Window

    per_os = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(late, 1)).alias("n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    stats = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "n_late_lines",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.count(F.when(F.col("n_late_lines") > 0, 1)).over(w).alias("n_late_supp"),
    )
    waiting = stats.where(
        (F.col("n_supp") >= 2)
        & (F.col("n_late_supp") == 1)
        & (F.col("n_late_lines") > 0)
    )
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,8))), 2) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape (phone prefix column absent -> mktsegment): "
    "scalar-subquery threshold (broadcast 1-row avg) + anti join "
    "against recent orders (dormant = no order since 2000 — the "
    "synthetic order density leaves 'never ordered' empty), then "
    "segment rollup.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem
        GROUP BY 1, 2
    ),
    eu AS (
        SELECT ps.*, s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    j AS (
        SELECT eu.*, p_partkey, p_name,
               min(ps_supplycost) OVER (PARTITION BY p_partkey) AS min_cost
        FROM eu JOIN part ON p_partkey = ps_partkey
        WHERE p_size = 15 AND p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           round(ps_supplycost, 2) AS supply_cost
    FROM j
    WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (no partsupp table -> supplier/part cost derived "
    "from lineitem: min unit price per (part, supplier) pair). The "
    "correlated min-cost subquery becomes a window MIN over the part "
    "key after the region filter — one shuffle on partkey instead of a "
    "re-scan per outer row. Equality against the window min is exact: "
    "MIN over doubles is order-independent and the min is an element of "
    "the compared set. Region/nation are constant-size -> broadcast. "
    "r15 (guide §3.2/§2.3): the selective part filter (p_size AND "
    "p_type keep ~0.4% of parts) joins lineitem BEFORE the "
    "(partkey, suppkey) min-aggregate — the aggregate's exchange now "
    "carries only qualifying parts' lines (sf0.1: 2,435 rows instead "
    "of 591k groups; the same ~250x at any SF, since the filter's "
    "selectivity is scale-free). Correct by construction: the filter "
    "is on the partkey dimension, so it removes whole (part, supplier) "
    "groups and never changes a surviving group's MIN. Catalyst could "
    "not do this itself — the filter sat above the aggregate, and "
    "aggregate-pushdown through a join is not a rule it applies.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"))
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    # p_name rides the aggregate keys (functionally dependent on the
    # part key) so part is scanned once and never re-joined.
    ps = (
        li.join(p.select("p_partkey", "p_name"),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            F.col("p_name"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "ps_supplycost"
            )
        )
    )
    eu = (
        ps.join(s, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    j = eu.withColumn(
        "min_cost", F.min("ps_supplycost").over(Window.partitionBy("ps_partkey"))
    )
    return (
        j.where(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_name",
            F.round("ps_supplycost", 2).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1.0 - l_discount AS DECIMAL(8,2))
                     - CAST(p_retailprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,0))
                       * CAST(0.6 AS DECIMAL(2,1))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, CAST(year(l_shipdate) AS BIGINT)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (profit by nation and year). No partsupp -> "
    "supply cost proxied as 0.6 * p_retailprice per unit, preserving "
    "the plan shape: LIKE-filtered part join pruning lineitem, 4-way "
    "join, year() extraction, two-key aggregate. All money math in "
    "exact DECIMAL so partition-parallel sums match the oracle "
    "bit-for-bit. part is filtered ~1/8 by the LIKE -> AQE may "
    "broadcast it at small SF; at 100 TB it shuffle-joins on partkey.",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    profit = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(8,2))"
        " - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,0))"
        "   * CAST(0.6 AS DECIMAL(2,1))"
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
        SELECT l_partkey AS partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1
    )
    SELECT partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM v
    WHERE part_value > (SELECT CAST(sum(part_value) AS DOUBLE) * 0.0001 FROM v)
    ORDER BY part_value DESC, partkey
    """,
    doc="TPC-H Q11 shape (important stock): per-part value within one "
    "nation, kept when above a fraction of the nation's total — a "
    "grouped aggregate compared against a global scalar subquery. "
    "Spark plans the scalar as a broadcast 1-row cross join, so the "
    "grouped side streams through one filter; no second shuffle. "
    "DECIMAL sums keep the threshold comparison exact on both engines. "
    "r15 (guide §3.2): supplier is pre-filtered to NATION_3 with a "
    "broadcast LEFT SEMI join on the nation key BEFORE the lineitem "
    "join (the q5/q7 prefilter pattern; a dim-join reorder instead "
    "gave the joined frame a product size estimate and the planner "
    "broadcast the FACT side — measured). The fact join then emits "
    "only the ~1/25 of lines from that nation's suppliers, and the "
    "separate nation filter-join disappears (the semi IS the filter; "
    "no nation column is needed downstream).",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n3_keys = F.broadcast(
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    s = s.join(n3_keys, s.s_nationkey == n3_keys.n_nationkey, "left_semi")
    v = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("part_value"))
    )
    total = v.agg(
        (F.sum("part_value").cast("double") * F.lit(0.0001)).alias("threshold")
    )
    return (
        v.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship). partsupp -> "
    "DISTINCT (partkey, suppkey) pairs from lineitem; the 'customer "
    "complaints' NOT IN exclusion keys on negative account balance "
    "(no s_comment column). NOT IN -> left-anti join; the excluded-"
    "supplier set scales with SF so it carries no broadcast hint (AQE "
    "broadcasts it while small). countDistinct shuffles only after "
    "the IN-list + brand/type filters prune parts ~6x.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    complainers = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    return (
        bridge.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(complainers, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2
    ),
    pt AS (SELECT l_partkey, sum(qty) AS total_qty FROM sp GROUP BY 1)
    SELECT DISTINCT s_name, s_acctbal
    FROM sp
    JOIN pt USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND qty > CAST(0.3 AS DECIMAL(2,1)) * total_qty
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion). availqty has no "
    "analog -> a supplier qualifies when its share of a 'small%' "
    "part's 1997 shipments exceeds 30% — the correlated half-sum "
    "subquery becomes a second aggregate over the first (per-part "
    "totals) joined back on partkey: two narrow shuffles instead of a "
    "per-supplier re-scan. DECIMAL quantity sums make the 30% "
    "threshold comparison exact on both engines. The nation filter "
    "lands on the (small) supplier dim.",
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3"))
    sp = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    pt = sp.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    return (
        sp.join(pt, F.col("l_partkey") == F.col("pt_partkey"))
        .where(F.col("qty") > F.expr("CAST(0.3 AS DECIMAL(2,1))") * F.col("total_qty"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name")
    )
