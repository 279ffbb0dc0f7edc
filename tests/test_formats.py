"""Format round-trips for the built-in sources/sinks + the Avro gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kcbdml9_big_data_processing_spark.sources.formats import (
    read_format,
    write_format,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)

ROWS = [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / fmt)
    opts = {"header": "true"} if fmt == "csv" else {}
    write_format(df, path, fmt, mode="overwrite", **opts)
    back = read_format(spark, path, fmt, schema=SCHEMA, **opts)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "part")
    write_format(df, path, "parquet", mode="overwrite", partition_by=["name"])
    assert (tmp_path / "part" / "name=a").exists()
    back = read_format(spark, path, "parquet").where(F.col("name") == "a")
    assert back.count() == 2


def test_avro_gated_with_clear_error(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(RuntimeError, match="spark-avro"):
        write_format(df, str(tmp_path / "avro"), "avro", mode="overwrite")


def test_kafka_gated_with_clear_error(spark):
    """S1: without the spark-sql-kafka jar, the Kafka source fails at
    plan time with actionable guidance (not a deep Py4J stack)."""
    import pytest as _pytest

    from kcbdml9_big_data_processing_spark.sources.kafka import read_kafka_stream

    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "devices")


def test_kafka_reader_options_reference_parity():
    """S1, one level deeper than the classpath gate: the option map the
    reader is constructed from carries exactly the reference's
    subscription semantics (StreamingJobImpl.scala:18-25 — broker
    list, single-topic subscribe, offset reset), extras pass through,
    and core keys can't be silently clobbered by positional args."""
    from kcbdml9_big_data_processing_spark.sources.kafka import (
        KAFKA_FORMAT,
        kafka_reader_options,
    )

    assert KAFKA_FORMAT == "kafka"
    opts = kafka_reader_options("broker1:9092,broker2:9092", "devices")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "devices",
        "startingOffsets": "latest",
    }
    # reference replays from a fixed policy; both values must map through
    assert (
        kafka_reader_options("b:9092", "t", "earliest")["startingOffsets"]
        == "earliest"
    )
    # production knobs pass through verbatim (backpressure, data-loss)
    opts = kafka_reader_options(
        "b:9092", "t", maxOffsetsPerTrigger="100000", failOnDataLoss="false"
    )
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["failOnDataLoss"] == "false"
    # a passthrough option cannot clobber the positional core keys
    assert (
        kafka_reader_options("b:9092", "t", subscribe="evil")["subscribe"] == "t"
    )
    # ...but an alternative subscription mode replaces `subscribe`
    # (Spark rejects a reader carrying two subscription options)
    patt = kafka_reader_options("b:9092", "t", subscribePattern="dev-.*")
    assert "subscribe" not in patt and patt["subscribePattern"] == "dev-.*"
