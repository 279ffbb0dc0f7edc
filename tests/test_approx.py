"""Accuracy guarantee for the approximate-distinct query. Since r13
the registry row IS the gate: user_reach_approx emits a bounded-error
witness (exact_users + within_3pct) whose DuckDB oracle recomputes
the exact count and a constant TRUE, so the driver hash-matches iff
the approximation lands inside the pinned bound. These tests pin the
same properties locally at two SFs — HLL relative error is constant
in theory, but a fixed bound at one SF says nothing about the other —
and additionally pin the RAW sketch against an independent exact
count, so a (hypothetical) witness-expression bug can't mask a broken
sketch behind a tautological boolean."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.queries.olap import user_reach_approx
from kcbdml9_big_data_processing_spark.sources.parquet import read_table


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"], ids=["sf0.01", "sf0.1"]
)
def test_user_reach_witness_is_true_and_exact(spark, sf):
    rows = {r["event_type"]: r for r in user_reach_approx(spark, sf).collect()}
    exact = {
        r["event_type"]: (r["n_users"], r["n_events"])
        for r in read_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for et, (n_users, n_events) in exact.items():
        r = rows[et]
        assert r["exact_users"] == n_users, (et, r["exact_users"], n_users)
        assert r["n_events"] == n_events, (et, r["n_events"], n_events)
        assert r["within_3pct"] is True, (et, dict(r.asDict()))


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"], ids=["sf0.01", "sf0.1"]
)
def test_raw_sketch_within_3pct_of_exact(spark, sf):
    # independent of the witness expression: recompute the raw HLL
    # estimate and compare against the exact count with the same
    # pinned bound — rsd=0.01 requested; 3% = 3 sigma, plus a
    # small-count floor so the deterministic test never flakes on
    # tiny groups while still catching a broken sketch
    ev = read_table(spark, sf, "events")
    both = {
        r["event_type"]: (r["approx_users"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.count_distinct("user_id").alias("n"),
        )
        .collect()
    }
    assert both
    for et, (approx, n) in both.items():
        assert abs(approx - n) <= max(3, 0.03 * n), (et, approx, n)


def test_witness_ignores_null_user_ids(spark, tmp_path):
    """r13 review: a NULL user_id forms its own pair group, which both
    COUNT(DISTINCT) and the HLL ignore — exact_users must count
    non-null users only (count(user_id), not count(*)) or the witness
    diverges from its oracle on any null-bearing input, while n_events
    still counts every row like the oracle's COUNT(*)."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("a", None), ("a", None), ("b", None)],
        "event_type string, user_id int",
    ).write.parquet(f"{sf}/events.parquet")
    rows = {r["event_type"]: r for r in user_reach_approx(spark, sf).collect()}
    assert rows["a"]["exact_users"] == 2  # users 1, 2 — NULLs ignored
    assert rows["a"]["n_events"] == 5  # every row counts
    assert rows["a"]["within_3pct"] is True
    assert rows["b"]["exact_users"] == 0 and rows["b"]["n_events"] == 1
    # |approx(0) - 0| = 0 <= floor(3): an all-null group is in bound
    assert rows["b"]["within_3pct"] is True


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"], ids=["sf0.01", "sf0.1"]
)
def test_approx_percentiles_witness_and_exact_agreement(spark, sf):
    """The GK-sketch percentile swap (approx_value_percentiles): the
    self-witness booleans hold at two SFs, and independently of the
    witness expression the returned values' EXACT ranks are inside
    the n/accuracy bound (so a witness bug can't bless a broken
    sketch). Also pins the degenerate-accuracy case: a coarse sketch
    (tiny accuracy -> wide bound) still reports ok, because the bound
    scales with it — the witness verifies the CONTRACT, not a fixed
    tolerance."""
    from kcbdml9_big_data_processing_spark.queries.olap import (
        approx_value_percentiles,
    )

    acc = 2000
    rows = approx_value_percentiles(spark, sf, accuracy=acc).collect()
    assert rows
    ev = read_table(spark, sf, "events").select("event_type", "value")
    by_type = {}
    for r in ev.collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(by_type) == {r["event_type"] for r in rows}
    for r in rows:
        vals = sorted(by_type[r["event_type"]])
        n = len(vals)
        assert r["n"] == n
        for p in (50, 90, 99):
            assert r[f"r{p}_ok"] is True, (r["event_type"], p, dict(r.asDict()))
            v = r[f"p{p}"]
            lt = sum(1 for x in vals if x < v)
            le = sum(1 for x in vals if x <= v)
            target = (p / 100) * n
            err = n / acc + 1
            assert lt - err <= target <= le + err, (r["event_type"], p, lt, le, n)

    coarse = approx_value_percentiles(spark, sf, accuracy=10).collect()
    assert all(r[f"r{p}_ok"] for r in coarse for p in (50, 90, 99))
