"""Generic file-format source/sink helpers.

The reference depends on spark-avro alongside parquet (build.sbt:12),
so Avro is part of its I/O surface; this environment (like a stock
PySpark install) doesn't ship the external spark-avro module jar, so
Avro is classpath-gated with a clear error, the same policy as Kafka
(sources/kafka.py). CSV/JSON/ORC/Parquet are built in and first-class.

Scale notes: prefer columnar (parquet/orc) for analytics — scans
prune columns and push filters; csv/json are row-formats for
ingest/egress edges only (no pushdown, full-row parse cost). All
writers accept partition columns so big outputs land hive-partitioned
for downstream pruned reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_BUILTIN = {"parquet", "orc", "csv", "json", "text"}


def _check_format(spark: SparkSession, fmt: str) -> None:
    if fmt in _BUILTIN:
        return
    if fmt == "avro":
        try:
            spark.read.format("avro").schema(
                T.StructType([T.StructField("x", T.LongType())])
            ).load("/nonexistent-avro-probe")
        except Exception as exc:
            if "Failed to find data source" in str(exc):
                raise RuntimeError(
                    "Avro needs the external spark-avro module: add "
                    "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
                ) from exc
            # data source resolved; path error is expected and fine


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Pass an explicit schema for row
    formats (csv/json) — schema inference is an extra full scan at
    100 TB and is nondeterministic under dirty data."""
    _check_format(spark, fmt)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_format(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    _check_format(df.sparkSession, fmt)
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
