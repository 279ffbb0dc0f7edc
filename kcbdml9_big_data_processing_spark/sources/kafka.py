"""Kafka streaming source.

S1 in SURVEY.md §2.1 (streaming/StreamingJobImpl.scala:18-25). The
Kafka connector jar (spark-sql-kafka) is not on this environment's
classpath, so ``read_kafka_stream`` raises a clear error at plan time
if unavailable; the streaming jobs accept any source DataFrame, and
tests drive them with the file source (``sources.files``) instead —
the downstream plan (JSON parse → watermark → windowed agg) is
identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    **options: str,
) -> DataFrame:
    """Subscribe to a Kafka topic; yields the raw Kafka schema
    (key/value binary, topic, partition, offset, timestamp, ...).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "Kafka source unavailable (spark-sql-kafka jar not on classpath). "
            "Add --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "or drive the job with sources.files.read_file_stream for tests."
        ) from exc
