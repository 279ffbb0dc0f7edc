"""Streaming sources.

The reference binds the speed layer to Kafka (S1,
streaming/StreamingJobImpl.scala:18-25 — our Kafka reader is
sources/kafka.py). Every downstream operator takes a DataFrame, so a
file source replaying the same rows is plan-identical after the
parse step — that's what tests and the driver's bounded streaming
queries use (no Kafka broker in this environment).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events.parquet read-side schema under nanosAsLong (ts arrives as
#: bigint nanoseconds; see sources/parquet.py for the full story)
_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream the driver's events table through the file source.

    Same nanos->micros truncation as the batch reader, applied on the
    stream (stays a per-row projection — no state). With
    ``max_files_per_trigger`` unset and an availableNow trigger, the
    whole table arrives as one bounded stream — the driver-checkable
    configuration; tests set 1 for deterministic micro-batch
    boundaries.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
        .format("parquet")
        # the file source wants a directory; select just the events
        # table out of the shared sf_dir with a glob
        .option("pathGlobFilter", "events.parquet")
        .option("recursiveFileLookup", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(sf_dir)
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
