"""SQL front-end: raw ANSI SQL over the registered views must agree
with the DataFrame registry on the same computation."""

from __future__ import annotations

from kcbdml9_big_data_processing_spark.queries.olap import revenue_forecast
from kcbdml9_big_data_processing_spark.sql import register_views, run_sql

SF = "/root/testdata/sf0.001"


def test_sql_matches_dataframe_phrasing(spark):
    df_rows = sorted(map(tuple, revenue_forecast(spark, SF).collect()))
    sql_rows = sorted(
        map(
            tuple,
            run_sql(
                spark,
                SF,
                """
                SELECT CAST(SUM(CAST(FLOOR((l_extendedprice * l_discount) * 1000000.0)
                           AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
                       COUNT(*) AS n_rows
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                  AND l_discount >= 0.05 AND l_discount <= 0.07
                  AND l_quantity < 24.0
                """,
            ).collect(),
        )
    )
    assert df_rows == sql_rows


def test_events_view_is_nanos_safe(spark):
    register_views(spark, SF)
    row = spark.sql(
        "SELECT min(ts) AS lo, max(ts) AS hi, count(*) AS n FROM events"
    ).first()
    assert row["n"] > 0
    assert row["lo"].year == 2024  # parsed as timestamps, not bigints
