"""Partitioned parquet archive sink (batch flavor).

The batch counterpart of the reference's streaming archive writer
(K2, streaming/StreamingJobImpl.scala:96-109): derive year/month/day/
hour from event time and write hive-partitioned parquet. The layout is
what makes the batch layer's partition-pruned hourly read (S2) an
O(one hour) scan instead of an O(archive) scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.partitions import derive_time_partitions


def write_partitioned_archive(
    df: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    mode: str = "append",
) -> None:
    """Write ``df`` partitioned by year/month/day/hour of ``ts_col``."""
    (
        derive_time_partitions(df, ts_col)
        .write.mode(mode)
        .partitionBy("year", "month", "day", "hour")
        .parquet(path)
    )
