"""Cross-engine deterministic arithmetic: Spark vs DuckDB equivalence."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from kcbdml9_big_data_processing_spark.functions.exact import (
    bucket_start,
    bucket_start_sql,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
)


def test_dsum_davg_match_duckdb(spark):
    vals = [1.111111111, 2.5, -3.00001, 1e9 + 0.123456, 0.0000004]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    srow = sdf.agg(dsum("x").alias("s"), davg("x").alias("a")).first()
    orow = duckdb.sql(
        f"SELECT {dsum_sql('x')} AS s, {davg_sql('x')} AS a FROM "
        f"(SELECT unnest({vals}) AS x)"
    ).fetchone()
    assert srow["s"] == orow[0]
    assert srow["a"] == orow[1]


def test_bucket_start_matches_window_start(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 0),),
        (dt.datetime(2024, 1, 1, 0, 1, 29),),
        (dt.datetime(2024, 1, 1, 0, 1, 30),),
        (dt.datetime(2024, 3, 15, 13, 37, 59),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = df.select(
        bucket_start("ts", 90).alias("b"),
        F.window("ts", "90 seconds").start.alias("w"),
    )
    for r in out.collect():
        assert r["b"] == r["w"]


def test_bucket_start_sql_matches_spark_incl_negative_epoch(spark):
    stamps = [
        dt.datetime(2024, 1, 1, 0, 0, 44),
        dt.datetime(1969, 12, 31, 23, 59, 59),  # negative epoch
        dt.datetime(1970, 1, 1, 0, 0, 1),
    ]
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    spark_vals = sorted(
        r["w"] for r in df.select(F.window("ts", "90 seconds").start.alias("w")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(ts TIMESTAMP)")
    for t in stamps:
        con.execute("INSERT INTO t VALUES (?)", [t])
    duck_vals = sorted(
        r[0] for r in con.execute(
            f"SELECT {bucket_start_sql('ts', 90)} FROM t"
        ).fetchall()
    )
    assert spark_vals == duck_vals


def test_epoch_millis_is_timezone_free_on_ntz(spark):
    """epoch_millis on TIMESTAMP_NTZ must give naive-as-UTC epoch ms
    under ANY session timezone — the external driver owns its session,
    and a tz-dependent formulation (unix_millis over cast) silently
    shifts by the zone offset (measured +5 h under America/New_York).
    Exercised in a sibling session with a non-UTC zone."""
    from pyspark.sql import functions as F

    from kcbdml9_big_data_processing_spark.functions.exact import epoch_millis

    ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = ny.createDataFrame(
            [("2024-01-01 00:00:00.123",), ("1970-01-01 00:00:00",)], "s string"
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        got = [r["ms"] for r in df.select(epoch_millis("ts").alias("ms")).collect()]
        assert got == [1704067200123, 0]
        # and the legacy TIMESTAMP input stays exact under UTC sessions
        df2 = spark.createDataFrame([(1704067200123456,)], "us long").select(
            F.expr("timestamp_micros(us)").alias("ts")
        )
        assert df2.select(epoch_millis("ts").alias("ms")).collect()[0]["ms"] == (
            1704067200123
        )
    finally:
        ny.conf.unset("spark.sql.session.timeZone")
