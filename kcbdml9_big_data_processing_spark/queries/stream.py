"""Streaming queries, driver-checkable: each runs a REAL Structured
Streaming query (file source over the events table, availableNow
trigger, complete-mode memory sink), blocks until the bounded stream
drains, and returns the materialized result — which must equal the
batch answer, so the DuckDB oracle applies to the streaming engine
too (A1-A3 / T1-T2 / T5, streaming/StreamingJobImpl.scala:43-77).

Output mode choice: complete (not the reference's append) because a
bounded replay under append+watermark never finalizes the trailing
windows — the stream ends before the watermark passes them. Complete
mode emits every window, making stream == batch an exact equality.
Append+watermark semantics (late-data eviction) are pinned in
tests/test_streaming.py instead, where micro-batch boundaries are
controlled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..operators.metrics import conform_metric, windowed_sum
from ..streaming.sources import read_documents_stream, read_events_stream
from .parity import NINETY_SECONDS, _metric_oracle
from .registry import register


def _run_bounded_metric(
    spark: SparkSession, sf_dir: str, key, tag: str, name: str
) -> DataFrame:
    """Run one windowed metric as a bounded stream into a complete-mode
    memory sink; return the sink table."""
    src = read_events_stream(spark, sf_dir)
    agg = windowed_sum(
        src, key, "90 seconds", ts_col="ts", value_col="value", agg=dsum("value")
    )
    metric = conform_metric(agg, key if isinstance(key, str) else "app", tag)
    q = (
        metric.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "stream_bytes_antenna_90s",
    oracle=_metric_oracle("event_type", NINETY_SECONDS, "antenna_bytes_total"),
)
def stream_bytes_antenna_90s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as true streaming: file-source replay -> 90 s tumbling
    window -> sum -> metric conformance, executed by the streaming
    engine (StreamExecution micro-batches + state store), result
    hash-checked against the same oracle as the batch phrasing."""
    return _run_bounded_metric(
        spark, sf_dir, "event_type", "antenna_bytes_total", "stream_antenna_90s"
    )


def stream_bytes_user_90s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 as true streaming (key user_id)."""
    return _run_bounded_metric(
        spark, sf_dir, "user_id", "user_bytes_total", "stream_user_90s"
    )


def stream_bytes_app_90s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 as true streaming: the key comes out of the JSON payload
    (P3) on the stream before windowing."""
    src = read_events_stream(spark, sf_dir).withColumn(
        "app", F.get_json_object("props", "$.k")
    )
    agg = windowed_sum(
        src, "app", "90 seconds", ts_col="ts", value_col="value", agg=dsum("value")
    )
    metric = conform_metric(agg, "app", "app_bytes_total")
    q = (
        metric.writeStream.format("memory")
        .queryName("stream_app_90s")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stream_app_90s")


@register(
    "stream_bytes_user_app_90s",
    oracle=f"""
        ({_metric_oracle("user_id", NINETY_SECONDS, "user_bytes_total")})
        UNION ALL
        ({_metric_oracle(
            "json_extract_string(props, '$.k')", NINETY_SECONDS,
            "app_bytes_total")})
    """,
)
def stream_bytes_user_app_90s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 + A3 as true streaming, one registration (the ``type``
    column already discriminates the two metric families, so the union
    is the natural suite shape — same consolidation pattern the batch
    bytes_90s suite uses). Each constituent still runs its own full
    StreamExecution (file replay, state store, complete-mode drain);
    only the registration count shrinks, freeing a driver row for the
    semantic-dedup clustering query."""
    return stream_bytes_user_90s(spark, sf_dir).unionAll(
        stream_bytes_app_90s(spark, sf_dir)
    )


@register(
    "stream_dedup_events",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the ingestion-side dedup stage of a
    training-data pipeline. Two independent file-source replays of the
    events table are unioned — every event arrives (at least) twice,
    the at-least-once delivery a real broker gives you — and
    ``dropDuplicates`` on the event key emits only the first arrival,
    maintained by the streaming state store across micro-batches.
    The oracle is simply the distinct event set, so the driver
    hash-checks that the streaming engine suppressed every redelivery.

    No watermark here because the replay is bounded and complete-state
    dedup makes stream == batch an exact equality; unbounded streams
    use ``dropDuplicatesWithinWatermark`` so state is evicted once an
    event key can no longer be redelivered — that production variant's
    eviction semantics are pinned in tests/test_streaming.py, where
    micro-batch boundaries are controlled."""
    doubled = read_events_stream(spark, sf_dir).unionAll(
        read_events_stream(spark, sf_dir)
    )
    deduped = doubled.dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup_events_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stream_dedup_events_sink")


def _curated_ingest_oracle() -> str:
    from .dedup import _NORM_SQL
    from .text import _SW_ARR_SQL, _tokens_sql

    t = _tokens_sql()
    return f"""
        SELECT doc_id, text, lang, source, n_chars,
               {_NORM_SQL} AS content_hash
        FROM documents
        WHERE len({t}) >= 5
          AND CAST(len(list_filter({t}, x -> list_contains({_SW_ARR_SQL}, x)))
                   AS DOUBLE) / CAST(len({t}) AS DOUBLE) <= 0.9
          AND CAST(len(list_distinct({t})) AS DOUBLE)
                / CAST(len({t}) AS DOUBLE) >= 0.1
    """


@register("stream_curated_ingest", oracle=_curated_ingest_oracle())
def stream_curated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-ingest curation operator
    (streaming/curation.curate_stream) as a driver-checked query: two
    independent file-source replays of the documents table are unioned
    — every document arrives (at least) twice, the at-least-once
    delivery a real broker gives you — and the curation stream
    quality-gates each arrival (word count, stopword ratio, lexical
    diversity: the same thresholds as the batch curator) then
    suppresses redeliveries with ``dropDuplicatesWithinWatermark`` on
    the normalized content hash, state evicted by the watermark. The
    oracle is the quality-passing distinct document set plus its
    content hash, so the driver hash-checks both halves of the ingest
    path (gate arithmetic AND dedup) as executed by the real streaming
    engine (StreamExecution, state store, watermark advance). The
    event-time axis (``ts`` = epoch + doc_id seconds,
    streaming/sources.read_documents_stream) is dropped from the
    result to keep the comparison engine-portable; eviction *timing*
    semantics are pinned in tests/test_stream_curation.py where
    micro-batch boundaries are controlled."""
    from ..streaming.curation import curate_stream

    doubled = read_documents_stream(spark, sf_dir).unionAll(
        read_documents_stream(spark, sf_dir)
    )
    curated = curate_stream(doubled)
    q = (
        curated.drop("ts")
        .writeStream.format("memory")
        .queryName("stream_curated_ingest_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stream_curated_ingest_sink")
