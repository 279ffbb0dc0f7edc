"""Hourly quota-violation report.

A7 + F2 in SURVEY.md §2.4/2.6 (batch/BatchJobImpl.scala:79-88): group
the enriched fact by (email, quota, 1h window), sum usage, and keep
rows where usage exceeded quota — a HAVING with a column-vs-column
theta predicate. Output conforms to the ``user_quota_limit`` layout
(email, usage, quota, timestamp) per JdbcProvisioner.scala:58.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quota_violations(
    df: DataFrame,
    user_col: str = "email",
    quota_col: str = "quota",
    ts_col: str = "timestamp",
    value_col: str = "bytes",
    window_duration: str = "1 hour",
    usage_agg: Column | None = None,
) -> DataFrame:
    agg = usage_agg if usage_agg is not None else F.sum(value_col)
    return (
        df.groupBy(F.col(user_col), F.col(quota_col), F.window(F.col(ts_col), window_duration))
        .agg(agg.alias("usage"))
        .where(F.col("usage") > F.col(quota_col))
        .select(
            F.col(user_col),
            F.col("usage"),
            F.col(quota_col),
            F.col("window.start").alias("timestamp"),
        )
    )
