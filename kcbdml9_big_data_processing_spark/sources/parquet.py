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
    """Read one driver testdata table (TESTDATA.md).

    ``events.parquet`` stores nanosecond timestamps, which Spark
    refuses to read natively (PARQUET_TYPE_ILLEGAL). We read them as
    bigint nanos (``spark.sql.legacy.parquet.nanosAsLong`` — a runtime
    conf, set here because the caller may own the session) and truncate
    to microseconds with integer division, matching how DuckDB (and any
    micros-precision engine) reads the same file. ``div`` keeps the
    arithmetic in int64 — a double division would lose precision above
    2^53 ns (~1970+104 days). Assumes positive (post-1970) epochs.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
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
