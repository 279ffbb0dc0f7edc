"""Kafka streaming source.

S1 in SURVEY.md §2.1 (streaming/StreamingJobImpl.scala:18-25). The
reference subscribes to one topic and parses the ``value`` payload as
JSON; here the reader construction is split in two so each half is
testable without a broker:

- :func:`kafka_reader_options` — the pure option mapping (format +
  ``kafka.bootstrap.servers`` + ``subscribe`` + ``startingOffsets``),
  asserted against the reference's semantics in tests;
- :func:`read_kafka_stream` — applies that mapping to
  ``spark.readStream`` and loads. The spark-sql-kafka jar is not on
  this environment's classpath, so it raises a clear error at plan
  time if unavailable.

Production switch-over: submit with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``
(or bake the jar into the image), call ``read_kafka_stream(spark,
brokers, topic)``, then ``operators.parse.parse_json_payload(df,
"value", EVENT_PROPS_SCHEMA)`` — the downstream plan (JSON parse →
watermark → windowed agg → sink) is byte-identical to what the file
source drives in tests, because every streaming job here takes an
arbitrary source DataFrame. For exactly-once into JDBC use the
idempotent ``streaming.sinks.start_idempotent_jdbc`` sink; offsets are
tracked by the query's checkpoint, not by Kafka consumer groups
(Spark manages its own offsets — the reference relies on the same
mechanism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: DataSource V2 short name registered by the spark-sql-kafka package.
KAFKA_FORMAT = "kafka"


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    **options: str,
) -> dict[str, str]:
    """The option map a Kafka subscription needs, reference-parity
    (StreamingJobImpl.scala:18-25): broker list, a single-topic
    ``subscribe``, and the offset reset policy. Extra ``options`` pass
    through verbatim (e.g. ``maxOffsetsPerTrigger`` for backpressure —
    the knob that bounds micro-batch size at 100 TB/day ingest;
    ``failOnDataLoss`` for compacted topics)."""
    out = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    # an alternative subscription mode replaces `subscribe` (Spark
    # rejects readers carrying two); anything else layers on top but
    # cannot clobber the positional broker/topic/offset arguments
    if "subscribePattern" in options or "assign" in options:
        del out["subscribe"]
    out.update({k: v for k, v in options.items() if k not in out})
    return out


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
    reader = spark.readStream.format(KAFKA_FORMAT)
    for k, v in kafka_reader_options(
        bootstrap_servers, topic, starting_offsets, **options
    ).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "Kafka source unavailable (spark-sql-kafka jar not on classpath). "
            "Add --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "or drive the job with sources.files.read_file_stream for tests."
        ) from exc
