"""Time-partition derivation.

P8 in SURVEY.md §2.3 (streaming/StreamingJobImpl.scala:98-101): derive
year/month/day/hour INT columns from an event-time column, for hive
partitioning of the archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_time_partitions(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    ts = F.col(ts_col)
    return (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
        .withColumn("hour", F.hour(ts))
    )
