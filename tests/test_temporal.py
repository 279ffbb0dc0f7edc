"""General as-of join and interval join operators (operators/temporal):
known-answer behavior on tiny frames, plus equivalence to the
oracle-checked registry queries on the driver testdata — which anchors
the general operators to the DuckDB-verified semantics transitively.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.operators.temporal import (
    asof_join,
    interval_join,
)

SF = "/root/testdata/sf0.001"


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_known_answer(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _t(0, 30)),
            (2, "A", _t(2, 0)),
            (3, "B", _t(1, 0)),
            (4, "C", _t(1, 0)),  # no quotes for C at all
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _t(0, 0), 10.0),
            ("A", _t(0, 30), 11.0),  # tie with trade 1 -> "at or before"
            ("A", _t(1, 0), 12.0),
            ("B", _t(2, 0), 99.0),  # after B's only trade -> unmatched
        ],
        "sym string, ts timestamp, px double",
    )
    got = {
        r["trade_id"]: (r["asof_ts"], r["asof_px"])
        for r in asof_join(
            trades, quotes, on="sym", right_cols=["px"]
        ).collect()
    }
    assert got[1] == (_t(0, 30), 11.0)  # equal ts is visible
    assert got[2] == (_t(1, 0), 12.0)  # latest preceding quote
    assert got[3] == (None, None)  # B's quote is in the future
    assert got[4] == (None, None)  # key never quoted


def test_asof_join_matches_registry_query(spark):
    """The general operator reproduces the oracle-checked
    asof_last_click_before_purchase on the driver testdata."""
    from kcbdml9_big_data_processing_spark.queries.olap import (
        asof_last_click_before_purchase,
    )
    from kcbdml9_big_data_processing_spark.sources.parquet import read_table

    ev = read_table(spark, SF, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    got = {
        r["event_id"]: r["last_click_ts"]
        for r in asof_join(
            purchases, clicks, on="user_id", prefix="last_click_"
        ).collect()
    }
    want = {
        r["event_id"]: r["last_click_ts"]
        for r in asof_last_click_before_purchase(spark, SF).collect()
    }
    assert got == want and len(want) > 0


def test_interval_join_known_answer(spark):
    left = spark.createDataFrame(
        [(1, "u", _t(10, 0)), (2, "u", _t(20, 0)), (3, "v", _t(10, 0))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u", _t(10, 50)),  # 50s from lid 1 -> in (60s tol)
            (101, "u", _t(12, 0)),  # 120s from lid 1 -> out
            (102, "v", _t(10, 30)),  # in, but other key than lid 1/2
            (103, "u", _t(19, 0)),  # exactly 60s from lid 2 -> in
        ],
        "rid long, k string, ts timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, on="k", tolerance_ms=60_000, left_id="lid", right_id="rid"
        ).collect()
    }
    assert got == {(1, 100), (2, 103), (3, 102)}


def test_interval_join_matches_registry_query(spark):
    """interval_join + self-pair exclusion + zero-filled counts equals
    the oracle-checked events_near_errors on the driver testdata."""
    from kcbdml9_big_data_processing_spark.queries.parity import (
        events_near_errors,
    )
    from kcbdml9_big_data_processing_spark.sources.parquet import read_table

    ev = read_table(spark, SF, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("r_id"), F.col("user_id").alias("user_id"),
        F.col("ts").alias("ts"),
    )
    pairs = interval_join(
        ev,
        errors,
        on="user_id",
        tolerance_ms=300_000,
        left_id="event_id",
        right_id="r_id",
    ).where(F.col("event_id") != F.col("r_id"))
    counts = pairs.groupBy("event_id").agg(F.count("r_id").alias("n"))
    got = {
        r["event_id"]: r["n_nearby_errors"]
        for r in ev.select("event_id")
        .join(counts, "event_id", "left_outer")
        .select(
            "event_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_nearby_errors"),
        )
        .collect()
    }
    want = {
        r["event_id"]: r["n_nearby_errors"]
        for r in events_near_errors(spark, SF).collect()
    }
    assert got == want and sum(want.values()) > 0
