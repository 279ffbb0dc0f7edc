"""Canonical schemas.

Re-expresses the reference's hand-built stream schema
(streaming/StreamingJobImpl.scala:29-35), its serving-table DDL
(provisioner/JdbcProvisioner.scala:26-58) and the archived-row shape
(batch/BatchJob.scala:11 — note the reference's case class drops
``app`` by mistake; the archive actually keeps it, see SURVEY.md §1.3)
as PySpark ``StructType``s, plus the schemas of the driver's synthetic
testdata tables (TESTDATA.md / FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-native schemas (FIXTURES.md §A) -------------------------

#: JSON device message on the wire (StreamingJobImpl.scala:29-35).
DEVICE_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("antenna_id", T.StringType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("app", T.StringType(), False),
    ]
)

#: Archived device message: message + hive partition columns
#: (StreamingJobImpl.scala:98-103).
ARCHIVED_DEVICE_MESSAGE_SCHEMA = T.StructType(
    list(DEVICE_MESSAGE_SCHEMA.fields)
    + [
        T.StructField("year", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("day", T.IntegerType(), True),
        T.StructField("hour", T.IntegerType(), True),
    ]
)

#: user_metadata dimension (JdbcProvisioner.scala:27).
USER_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("email", T.StringType(), False),
        T.StructField("quota", T.LongType(), False),
    ]
)

#: Long/narrow metric rows — `bytes` and `bytes_hourly` serving tables.
#: `type` discriminates the producing aggregation (antenna_bytes_total /
#: user_bytes_total / app_bytes_total / email_bytes_total).
#: DIVERGENCE from JdbcProvisioner.scala:52,55: the reference declares
#: `value BIGINT` because its device messages carry integer byte counts;
#: the driver testdata's `events.value` is DOUBLE, and this engine's
#: metric queries emit the deterministic fixed-point double (functions
#: .exact.dsum) — so the canonical serving schema here is DoubleType.
METRIC_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("type", T.StringType(), False),
    ]
)

#: user_quota_limit serving table (JdbcProvisioner.scala:58; same
#: BIGINT→DOUBLE divergence for `usage`/`quota` as METRIC_SCHEMA).
QUOTA_LIMIT_SCHEMA = T.StructType(
    [
        T.StructField("email", T.StringType(), True),
        T.StructField("usage", T.DoubleType(), True),
        T.StructField("quota", T.DoubleType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

# --- driver testdata schemas (FIXTURES.md §B) ---------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: schema of the JSON payload inside events.props
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
