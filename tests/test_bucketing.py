"""Bucketed co-located joins: the fact-fact join layout for scale."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_bucketed_join_is_shuffle_free(spark):
    from ella_spark.sources import load_table
    from ella_spark.sources.bucketed import bucketize, is_shuffle_free_join

    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    lb = bucketize(
        li.withColumnRenamed("l_orderkey", "okey"),
        "bkt_lineitem",
        ["okey"],
        num_buckets=8,
        sort_cols=["okey"],
    )
    ob = bucketize(
        o.withColumnRenamed("o_orderkey", "okey"),
        "bkt_orders",
        ["okey"],
        num_buckets=8,
        sort_cols=["okey"],
    )
    # at real scale neither side broadcasts; force that shape so the
    # join must rely on bucket co-location instead of a shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:2000]
        assert is_shuffle_free_join(joined), plan[:2000]
        # same answer as the shuffled join
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_range_join_is_equi_not_nested_loop(spark):
    """The interval-join rewrite must plan as a hash/SMJ equi-join on
    the day bucket — never BroadcastNestedLoopJoin (the naive theta
    join's plan, which is O(points x windows) at scale)."""
    from ella_spark.queries import _load, REGISTRY

    _load()
    df = REGISTRY["q_range_join"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )
