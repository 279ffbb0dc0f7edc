"""Unit tests for the operator vocabulary on tiny DataFrames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.operators.enrich import enrich
from kcbdml9_big_data_processing_spark.operators.metrics import (
    conform_metric,
    windowed_sum,
)
from kcbdml9_big_data_processing_spark.operators.parse import parse_json_payload
from kcbdml9_big_data_processing_spark.operators.partitions import (
    derive_time_partitions,
)
from kcbdml9_big_data_processing_spark.operators.quota import quota_violations
from kcbdml9_big_data_processing_spark.schemas import EVENT_PROPS_SCHEMA


def test_windowed_sum_90s(tiny_events):
    out = windowed_sum(
        tiny_events, "user_id", "90 seconds", ts_col="ts", value_col="value"
    )
    rows = {(r["user_id"], r["window"]["start"]): r["value"] for r in out.collect()}
    # user 7: events at 00:00:10 and 00:00:40 fall in [00:00, 01:30) -> 30
    assert rows[(7, dt.datetime(2024, 1, 1, 0, 0))] == 30.0
    # user 8: 01:50 and 02:10 both in [01:30, 03:00) -> 70
    assert rows[(8, dt.datetime(2024, 1, 1, 0, 1, 30))] == 70.0
    # user 7's purchase at 02:20 in [01:30, 03:00) -> 50
    assert rows[(7, dt.datetime(2024, 1, 1, 0, 1, 30))] == 50.0


def test_conform_metric_layout(tiny_events):
    agg = windowed_sum(tiny_events, "event_type", "1 hour", ts_col="ts", value_col="value")
    out = conform_metric(agg, "event_type", "tag_x")
    assert out.columns == ["timestamp", "id", "value", "type"]
    r = out.where(F.col("id") == "click").orderBy("timestamp").first()
    assert r["timestamp"] == dt.datetime(2024, 1, 1, 0, 0)
    assert r["value"] == 100.0  # 10 + 30 + 60 in the same hour
    assert r["type"] == "tag_x"


def test_enrich_drops_dup_key_and_inner_joins(tiny_events, tiny_users):
    out = enrich(tiny_events, tiny_users, "user_id", "id")
    assert "id" not in out.columns
    assert out.count() == 6  # every event user exists in the dim
    # a user missing from the dim drops its rows (inner join)
    out2 = enrich(tiny_events, tiny_users.where(F.col("id") != 9), "user_id", "id")
    assert out2.count() == 5


def test_quota_violations_having(tiny_events, tiny_users):
    enriched = enrich(tiny_events, tiny_users, "user_id", "id")
    out = quota_violations(
        enriched,
        user_col="email",
        quota_col="quota",
        ts_col="ts",
        value_col="value",
        window_duration="1 hour",
    )
    rows = {r["email"]: r for r in out.collect()}
    # alice: 10+20+50=80 > 25 -> violation; bob: 70 < 100 -> no; carol: 60 > 10 -> yes
    assert set(rows) == {"alice", "carol"}
    assert rows["alice"]["usage"] == 80.0
    assert rows["alice"]["quota"] == 25.0
    assert rows["alice"]["timestamp"] == dt.datetime(2024, 1, 1, 0, 0)


def test_parse_json_payload_permissive_nulls(tiny_events):
    out = parse_json_payload(tiny_events, "props", EVENT_PROPS_SCHEMA, keep=["event_id"])
    assert out.columns == ["event_id", "k"]
    got = {r["event_id"]: r["k"] for r in out.collect()}
    assert got[1] == 1 and got[4] == 3
    assert got[5] is None  # null payload -> null struct (PERMISSIVE)


def test_derive_time_partitions(tiny_events):
    out = derive_time_partitions(tiny_events, "ts")
    r = out.where(F.col("event_id") == 6).first()
    assert (r["year"], r["month"], r["day"], r["hour"]) == (2024, 1, 1, 0)


def test_profile_columns_counts_nulls_and_distincts(spark):
    from kcbdml9_big_data_processing_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x int, s string"
    )
    out = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert out["x"]["n_rows"] == 4
    assert out["x"]["n_nulls"] == 1
    assert out["x"]["n_distinct"] == 3  # countDistinct ignores null
    assert out["x"]["min_value"] == "1" and out["x"]["max_value"] == "3"
    assert out["s"]["n_nulls"] == 1
    assert out["s"]["n_distinct"] == 2
