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
