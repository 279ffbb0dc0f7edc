"""Bucketed co-located joins: the storage-layout lever SCALE.md
prescribes for repeated big joins — both tables bucketed on the join
key join WITHOUT a shuffle on either side."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.plans.inspect import physical_plan
from kcbdml9_big_data_processing_spark.sinks.bucketed import write_join_ready_pair
from kcbdml9_big_data_processing_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"
SF_BENCH = "/root/testdata/sf0.1"


def test_bucketed_sink_join_zero_exchanges_sf01(spark):
    """The sinks/bucketed.py writer at bench scale (sf0.1): the
    fact-x-fact lineitem/orders join on the written copies runs with
    ZERO exchanges anywhere in the join subtree, and the repeated-join
    payoff is real (same bucketed copies serve a second join shape
    shuffle-free too)."""
    lb, ob = write_join_ready_pair(
        spark,
        read_table(spark, SF_BENCH, "lineitem"),
        read_table(spark, SF_BENCH, "orders"),
        "l_orderkey",
        "o_orderkey",
        "lineitem_bsink",
        "orders_bsink",
        n_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for agg_key in ("o_orderpriority", "o_orderstatus"):
            j = (
                lb.join(ob, lb.l_orderkey == ob.o_orderkey)
                .groupBy(agg_key)
                .agg(F.sum("l_quantity").alias("q"))
            )
            plan = physical_plan(j, "simple")
            join_part = plan.split("HashAggregate")[-1]
            assert "SortMergeJoin" in plan
            # the whole join subtree is exchange-free (the sort that
            # remains is per-bucket and local: each write task emits
            # its own file per bucket, so Spark re-sorts within the
            # bucket without moving data)
            assert "Exchange" not in join_part, plan
            assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS lineitem_bsink")
        spark.sql("DROP TABLE IF EXISTS orders_bsink")


def test_bucketed_join_is_shuffle_free(spark):
    # warehouse dir is a static conf — tables land in the session
    # default and are dropped (managed => data deleted) in the finally
    orders = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem")
    (
        orders.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")

    # disable broadcast so the join would otherwise need a shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = physical_plan(j, "simple")
        # join itself introduces NO exchange: both sides pre-bucketed
        # on the join key. The only exchange is the final groupBy.
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"Exchange hashpartitioning", join_part)) == 0, plan
        # and the result is right
        unbucketed = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, unbucketed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_roundtrip_query_exchange_free(spark):
    """The registered round-trip query's join subtree is exchange-free
    with broadcast disabled — the bucketed layout, not broadcast, is
    what elides the shuffle."""
    from kcbdml9_big_data_processing_spark.queries.scale import bucketed_join_roundtrip

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join_roundtrip(spark, SF)
        plan = physical_plan(df, "simple")
        assert "SortMergeJoin" in plan, plan
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bjr")
        spark.sql("DROP TABLE IF EXISTS customer_bjr")
