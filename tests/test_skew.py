"""Salted join / two-phase agg must equal their plain counterparts."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain(spark):
    from ella_spark.operators.skew import salted_join
    from ella_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        ["k"],
        salt=4,
    ).agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q")).collect()[0]
    assert (salted.n, salted.q) == (plain.n, plain.q)


def test_salted_agg_matches_plain(spark):
    from ella_spark.operators.skew import salted_agg_sum
    from ella_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    }
    salted = {
        r.l_returnflag: r.sum_l_quantity
        for r in salted_agg_sum(li, ["l_returnflag"], ["l_quantity"], salt=8).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert abs(salted[k] - plain[k]) < 1e-6


def test_salted_join_rejects_right_and_full(spark):
    """Right/full joins would emit `salt` duplicate null-padded rows for
    unmatched right rows — the operator refuses them."""
    import pytest

    from ella_spark.operators.skew import salted_join

    left = spark.range(10).withColumnRenamed("id", "k")
    right = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, ["k"], how=how)
    salted_join(left, right, ["k"], how="left_anti")  # allowed


def test_global_order_stats_matches_window_form(spark):
    """Distributed global ranking (r14): positions, ntile buckets,
    and the percent_rank/cume_dist divisions must be BIT-identical to
    the single-partition Window form across the awkward totals — one
    row, fewer rows than buckets, exact multiples, a remainder, and a
    prime count (the SQL-standard fill: first total%n buckets one row
    larger)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ella_spark.operators.skew import global_order_stats

    for total, n in [(1, 4), (3, 4), (4, 4), (97, 4), (6, 10)]:
        df = spark.range(total).withColumn(
            "v", F.pmod(F.col("id") * 2654435761, F.lit(99991))
        )
        w = Window.orderBy("v", "id")
        exp = {
            r.id: (r.nt, r.pr, r.cd)
            for r in df.select(
                "id",
                F.ntile(n).over(w).alias("nt"),
                F.percent_rank().over(w).alias("pr"),
                F.cume_dist().over(w).alias("cd"),
            ).collect()
        }
        ranked = global_order_stats(df, ["v", "id"], ntile_n=n)
        got = {
            r.id: (r.nt, r.pr, r.cd)
            for r in ranked.select(
                "id",
                F.col("_ntile").alias("nt"),
                F.when(F.col("_total") == 1, F.lit(0.0))
                .otherwise(
                    (F.col("_pos") - 1).cast("double")
                    / F.greatest(F.col("_total") - 1, F.lit(1)).cast("double")
                )
                .alias("pr"),
                (
                    F.col("_pos").cast("double")
                    / F.col("_total").cast("double")
                ).alias("cd"),
            ).collect()
        }
        assert exp == got, (total, n)
