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

#: events.parquet read-side schema when the file stores int64
#: nanosecond timestamps (legacy encoding; read as bigint under
#: nanosAsLong — see sources/parquet.py for the full story)
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
    """Stream the events table through the file source, producing the
    SAME ``ts`` values and type as the batch reader
    (sources/parquet.py:read_table) regardless of how the file encodes
    timestamps.

    The file source needs an explicit schema, and the testdata has
    shipped ``ts`` as both int64 nanoseconds and ``timestamp[us]``
    (TIMESTAMP_NTZ) across driver versions — so we probe the file's
    batch schema first (planning-time only: reads footer metadata, no
    data scan) and declare the stream's schema from the probe. Only
    the legacy bigint-nanos encoding needs the nanos->micros
    truncation; the native micros encoding passes through untouched,
    keeping stream ``ts`` bit-identical to batch ``ts``.

    With ``max_files_per_trigger`` unset and an availableNow trigger,
    the whole table arrives as one bounded stream — the
    driver-checkable configuration; tests set 1 for deterministic
    micro-batch boundaries.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    ts_type = {f.name: f.dataType for f in probe.fields}.get("ts")
    legacy_nanos = isinstance(ts_type, T.LongType)
    reader = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA if legacy_nanos else probe)
        .format("parquet")
        # the file source wants a directory; select just the events
        # table out of the shared sf_dir with a glob
        .option("pathGlobFilter", "events.parquet")
        .option("recursiveFileLookup", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(sf_dir)
    if legacy_nanos:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


_DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


#: epoch-second base for the synthetic per-document event time. Must
#: sit above the engine's initial watermark (epoch 0): a row whose
#: event time equals the watermark is treated as late and dropped, so
#: deriving ts directly from doc_id loses doc 0 (measured).
_DOC_TS_BASE = 1_000_000_000


def read_documents_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream the documents table through the file source, with a
    deterministic per-document event time (``ts`` = epoch +
    _DOC_TS_BASE + doc_id seconds) so watermark-bearing operators
    (``dropDuplicatesWithinWatermark`` in streaming/curation.py) have
    an event-time axis. A real ingest stream carries arrival time;
    deriving it from doc_id keeps bounded-replay results hash-stable
    for the driver's oracle comparison."""
    reader = (
        spark.readStream.schema(_DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .option("recursiveFileLookup", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") + F.lit(_DOC_TS_BASE))
    )
