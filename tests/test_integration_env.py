"""Environment-gated REAL-SERVER integration tests (r6 verdict #8).

The three seams the sandbox cannot exercise — a PostgreSQL socket,
a Kafka broker + spark-sql-kafka jar, and the spark-avro module —
each get a skipif-gated test here, so the moment the environment
grows the dependency the seam closes automatically (skipped today,
passing there, never silently absent). Activation:

- PostgreSQL: set ``KCBDML9_PG_URL`` to a JDBC url, e.g.
  ``jdbc:postgresql://host:5432/db?user=u&password=p`` (the pgjdbc
  driver must be on Spark's classpath, e.g. ``--jars postgresql.jar``);
  set ``KCBDML9_PG_DSN`` to a psycopg2 DSN to also run the
  provisioner DDL round-trip.
- Kafka: set ``KCBDML9_KAFKA_BOOTSTRAP`` (host:port) with
  spark-sql-kafka on the classpath; optional ``KCBDML9_KAFKA_TOPIC``
  (default ``kcbdml9-smoke``) — the test round-trips rows through the
  broker with Spark's own batch Kafka sink, then streams them back.
- Avro: no env var — gated purely on whether the spark-avro data
  source resolves (sources/formats.py probes the classpath).

The non-gated siblings keep these paths honest meanwhile: Derby
exercises real JDBC (tests/test_jdbc.py), the PG dialect/DDL/typemap
is asserted against sqlite+duckdb (tests/test_provisioner.py), and
the Kafka wire-schema chain is contract-tested
(tests/test_streaming.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PG_URL = os.environ.get("KCBDML9_PG_URL")
_PG_DSN = os.environ.get("KCBDML9_PG_DSN")
_KAFKA = os.environ.get("KCBDML9_KAFKA_BOOTSTRAP")


def _avro_available(spark) -> bool:
    from kcbdml9_big_data_processing_spark.sources.formats import _check_format

    try:
        _check_format(spark, "avro")
        return True
    except RuntimeError:
        return False


@pytest.mark.skipif(not _PG_URL, reason="KCBDML9_PG_URL not set (no PG socket)")
def test_postgres_roundtrip_batch_and_partitioned_read(spark):
    """K3 + S3 against a real PostgreSQL: append a frame through the
    JDBC sink, read it back whole and as a 4-way partitioned scan —
    the exact serving flow Derby pins, on the reference's actual
    database (BatchJobImpl.scala:29-38, 90-100)."""
    from kcbdml9_big_data_processing_spark.sinks.jdbc import write_jdbc
    from kcbdml9_big_data_processing_spark.sources.jdbc import read_jdbc

    table = "kcbdml9_it_roundtrip"
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_jdbc(df, _PG_URL, table, mode="overwrite")
    back = read_jdbc(spark, _PG_URL, table)
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, 2 * i) for i in range(100)
    ]
    parts = read_jdbc(
        spark,
        _PG_URL,
        table,
        partition_column="k",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert parts.rdd.getNumPartitions() == 4
    assert parts.count() == 100


@pytest.mark.skipif(not _PG_DSN, reason="KCBDML9_PG_DSN not set (no PG socket)")
def test_postgres_provisioner_ddl_and_seed():
    """K4 against a real PostgreSQL: the provisioner's DDL + seed run
    on actual pgjdbc-dialect SQL (JdbcProvisioner.scala:7-64), then
    the seeded user rows are read back."""
    psycopg2 = pytest.importorskip("psycopg2")
    from kcbdml9_big_data_processing_spark.provisioner import provision

    conn = psycopg2.connect(_PG_DSN)
    try:
        provision(conn, paramstyle="format")
        cur = conn.cursor()
        cur.execute("SELECT count(*) FROM user_metadata")
        assert cur.fetchone()[0] >= 20
    finally:
        conn.close()


@pytest.mark.skipif(
    not _KAFKA, reason="KCBDML9_KAFKA_BOOTSTRAP not set (no broker/jar)"
)
def test_kafka_stream_roundtrip(spark, tmp_path):
    """S1 against a real broker: publish rows with Spark's batch Kafka
    sink, stream them back through read_kafka_stream, and run the
    standard parse chain (binary value -> string -> from_json) that
    the wire-schema contract test pins offline."""
    from kcbdml9_big_data_processing_spark.operators.parse import parse_json_payload
    from kcbdml9_big_data_processing_spark.sources.kafka import read_kafka_stream

    topic = os.environ.get("KCBDML9_KAFKA_TOPIC", "kcbdml9-smoke")
    payloads = [f'{{"device_id": "d{i}", "bytes": {i * 10}}}' for i in range(5)]
    spark.createDataFrame(
        [(p,) for p in payloads], "value string"
    ).write.format("kafka").option("kafka.bootstrap.servers", _KAFKA).option(
        "topic", topic
    ).save()

    schema = T.StructType(
        [
            T.StructField("device_id", T.StringType(), True),
            T.StructField("bytes", T.LongType(), True),
        ]
    )
    stream = read_kafka_stream(
        spark, _KAFKA, topic, starting_offsets="earliest"
    )
    parsed = parse_json_payload(stream, "value", schema)
    q = (
        parsed.writeStream.format("memory")
        .queryName("kafka_it")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {(r.device_id, r.bytes) for r in spark.table("kafka_it").collect()}
    assert {(f"d{i}", i * 10) for i in range(5)} <= got


def test_avro_roundtrip_when_module_present(spark, tmp_path):
    """Avro I/O (build.sbt:12 declares spark-avro): round-trip a frame
    when the module is on the classpath; otherwise assert the gate
    raises its actionable error instead of an opaque one."""
    from kcbdml9_big_data_processing_spark.sources.formats import (
        read_format,
        write_format,
    )

    df = spark.range(0, 10).select(F.col("id"), (F.col("id") % 3).alias("g"))
    path = str(tmp_path / "avro_out")
    if _avro_available(spark):
        write_format(df, path, "avro")
        back = read_format(spark, path, "avro")
        assert back.count() == 10
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_format(df, path, "avro")
