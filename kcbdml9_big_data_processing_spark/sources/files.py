"""File-based streaming source — the test double for Kafka.

Structured Streaming's file source replays files dropped into a
directory as micro-batches (``maxFilesPerTrigger=1`` gives one file
per batch — deterministic batch boundaries for watermark/late-data
tests). The downstream plan is byte-identical to the Kafka path after
the parse step, which is why the streaming jobs take a source
DataFrame instead of binding to Kafka the way the reference does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
