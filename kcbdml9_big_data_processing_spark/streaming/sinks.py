"""Streaming sinks.

K1/T3: foreachBatch micro-batch sink — the reference appends each
micro-batch to PostgreSQL over JDBC inside a Future
(streaming/StreamingJobImpl.scala:79-94). Here the batch writer is a
callable, so the same operator serves JDBC (sinks/jdbc.py), DuckDB in
tests, or any batch writer — and unlike the reference, the query is
checkpointed (the reference checkpoints only its storage sink, so its
JDBC queries reprocess on restart; SURVEY.md §2.10 T4).

K2/T4: checkpointed partitioned-parquet archive
(StreamingJobImpl.scala:96-109).

At-least-once note, same trade as the reference: foreachBatch
re-delivers the failed micro-batch on recovery; writers that dedupe on
(type, id, timestamp) make it effectively exactly-once. batch_id is
passed through so writers can implement idempotency.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.partitions import derive_time_partitions

BatchWriter = Callable[[DataFrame, int], None]


def start_foreach_batch(
    df: DataFrame,
    writer: BatchWriter,
    checkpoint_dir: str,
    query_name: str,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Start a checkpointed foreachBatch sink query (K1/T3/T4)."""
    w = (
        df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_partitioned_archive(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    ts_col: str = "timestamp",
    query_name: str = "archive",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Start the raw-stream archive: derive year/month/day/hour from
    event time, append hive-partitioned parquet, checkpointed
    (StreamingJobImpl.scala:96-109). The partition layout is what
    makes the batch layer's hourly read a pruned scan (S2/F1)."""
    w = (
        derive_time_partitions(df, ts_col)
        .writeStream.format("parquet")
        .partitionBy("year", "month", "day", "hour")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
