"""JDBC source.

S3 in SURVEY.md §2.1: the reference reads its ``user_metadata``
dimension over JDBC (batch/BatchJobImpl.scala:29-38) with no
parallelism or pushdown options. This version exposes the options that
matter at scale: predicate/aggregate pushdown stays on, and a
``partition_column`` + bounds splits the read across executors instead
of funnelling the whole table through one connection.

Exercised for real in tests/test_jdbc.py against the Derby embedded
driver that ships on Spark's own classpath — scan, partitioned scan,
and the streaming foreachBatch append all run end-to-end; the code
path is the standard public DataSource V1 JDBC reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """Build a JDBC scan. Lazy — nothing connects until an action runs."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
