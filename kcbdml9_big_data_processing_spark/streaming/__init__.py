"""Structured Streaming layer — the speed layer of the reference's
lambda architecture (streaming/StreamingJob.scala:26-46,
StreamingJobImpl.scala:18-109), re-expressed as composable PySpark.

Modules:
- sources:  file-driven event streams (the Kafka test double) +
            the Kafka binding itself (sources/kafka.py)
- sinks:    foreachBatch micro-batch sink (K1/T3), checkpointed
            partitioned-parquet archive (K2/T4)
- job:      multi-query orchestration (T6): N concurrent streaming
            queries on one session, awaitAnyTermination
"""

from .job import StreamingJob, StreamingJobConfig  # noqa: F401
from .sinks import start_foreach_batch, start_partitioned_archive  # noqa: F401
from .sources import read_events_stream  # noqa: F401
