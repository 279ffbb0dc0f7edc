"""Accuracy guarantee for the approximate-distinct query: the driver
can only rows-check user_reach_approx (sketches are engine-specific),
so pin its accuracy locally against the exact distinct count — the
bounded check that upgrades the driver's rows-only row. Pinned at two
SFs: HLL relative error is constant in theory, but a fixed bound at
one SF says nothing about the other."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.queries.olap import user_reach_approx
from kcbdml9_big_data_processing_spark.sources.parquet import read_table


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"], ids=["sf0.01", "sf0.1"]
)
def test_user_reach_approx_within_3pct_of_exact(spark, sf):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in user_reach_approx(spark, sf).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        # rsd=0.01 requested; 3% = 3 sigma, plus a small-count floor so
        # the deterministic test never flakes on tiny groups while
        # still catching a broken sketch
        assert abs(approx[et] - n) <= max(3, 0.03 * n), (et, approx[et], n)
