"""Salted transforms must equal their unsalted counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed(spark):
    """1000 rows for the hot key, a handful elsewhere."""
    hot = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id").alias("uid"), F.lit(1.0).alias("v")
    )
    cold = spark.range(5).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"),
        (F.col("id") + 10_000).alias("uid"),
        F.lit(2.0).alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_aggregate_equals_direct(spark):
    df = _skewed(spark)
    direct = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            salt_col="uid",
            aggs={"s": F.sum("v"), "n": F.count(F.lit(1))},
            n_salts=8,
        ).collect()
    }
    assert salted == direct
    assert salted["hot"] == (1000.0, 1000)


def test_salted_aggregate_min_max_tuple_merge(spark):
    """min/max partials must re-merge as min/max, not sum."""
    df = _skewed(spark).withColumn("w", F.col("uid").cast("double"))
    direct = {
        r["k"]: (r["lo"], r["hi"], r["s"])
        for r in df.groupBy("k")
        .agg(F.min("w").alias("lo"), F.max("w").alias("hi"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["lo"], r["hi"], r["s"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            salt_col="uid",
            aggs={
                "lo": (F.min("w"), F.min),
                "hi": (F.max("w"), F.max),
                "s": F.sum("v"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == direct
    assert salted["hot"] == (0.0, 999.0, 1000.0)


def test_salted_join_rejects_dim_preserving_how(spark):
    import pytest

    fact = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    for bad in ("right", "full", "full_outer", "left_semi", "cross"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", "k", salt_col="uid", how=bad)


def test_salted_join_equals_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c3", "C3")], "k string, label string"
    )
    plain = sorted(
        (r["k"], r["uid"], r["label"])
        for r in fact.join(dim, "k").select(fact["k"], "uid", "label").collect()
    )
    salted = sorted(
        (r["k"], r["uid"], r["label"])
        for r in salted_join(fact, dim, "k", "k", salt_col="uid", n_salts=8)
        .select("k", "uid", "label")
        .collect()
    )
    assert salted == plain
    assert len(salted) == 1002  # 1000 hot + c1 + c3


def test_skew_salted_agg_query_plan_is_two_phase(spark):
    """The registered skew query really runs the salted two-phase
    shape: the physical plan aggregates by (event_type, __salt) below
    a second aggregate by event_type alone."""
    from kcbdml9_big_data_processing_spark.plans.inspect import physical_plan
    from kcbdml9_big_data_processing_spark.queries.scale import skew_salted_agg

    plan = physical_plan(skew_salted_agg(spark, "/root/testdata/sf0.001"), "simple")
    # the salt (pmod of xxhash64) is a grouping expression of phase 1
    assert "pmod(xxhash64" in plan, plan
    # two distinct keyed aggregates (each a partial+final pair)
    assert plan.count("HashAggregate") >= 4, plan
