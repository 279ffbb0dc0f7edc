"""Parquet sources.

S2 in SURVEY.md §2.1: the reference loads its hive-partitioned device
archive and keeps exactly one (year, month, day, hour) partition
(batch/BatchJobImpl.scala:17-27). Expressed declaratively, Catalyst
turns the four equality predicates into static partition pruning — at
100 TB the scan touches one hour's files, not the table.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_partitioned_archive(
    spark: SparkSession,
    storage_path: str,
    at: dt.datetime | None = None,
) -> DataFrame:
    """Read a year/month/day/hour-partitioned parquet archive.

    With ``at`` set, keep only that hour's partition — the filter is on
    partition columns, so Catalyst prunes at planning time (verify with
    ``.explain``: the scan's ``PartitionFilters`` carries all four
    predicates). Mirrors batch/BatchJobImpl.scala:17-27.
    """
    df = spark.read.parquet(storage_path)
    if at is not None:
        df = df.where(
            (F.col("year") == at.year)
            & (F.col("month") == at.month)
            & (F.col("day") == at.day)
            & (F.col("hour") == at.hour)
        )
    return df
