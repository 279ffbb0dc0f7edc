"""Accuracy guarantee for the approximate-distinct query: the driver
can only rows-check user_reach_approx (sketches are engine-specific),
so pin its accuracy locally against the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.queries.olap import user_reach_approx
from kcbdml9_big_data_processing_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.01"


def test_user_reach_approx_within_rsd_bounds(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in user_reach_approx(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        # rsd=0.01 requested; allow 5 sigma so the deterministic test
        # never flakes while still catching a broken sketch
        assert abs(approx[et] - n) <= max(5, 0.05 * n), (et, approx[et], n)
