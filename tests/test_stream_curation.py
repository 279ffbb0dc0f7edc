"""Streaming ingest curation (streaming/curation.py): quality-failing
docs never reach the sink, redelivered documents are suppressed by the
content-hash state store, and — after the watermark passes — state is
evicted so the same content CAN reappear (the bounded-state trade the
module docstring documents). Micro-batch boundaries are controlled by
feeding files one at a time and draining with processAllAvailable().
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from kcbdml9_big_data_processing_spark.sources.files import read_file_stream
from kcbdml9_big_data_processing_spark.streaming.curation import (
    IngestCurationConfig,
    start_curated_ingest,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

_GOOD = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_curated_ingest_quality_dedup_and_eviction(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: one good doc, one too-short doc, one stopword-saturated
    _write(
        spark,
        src,
        [
            (1, _t(0, 10), _GOOD),
            (2, _t(0, 11), "too short"),
            (3, _t(0, 12), "the the the the the a of to in is the the"),
        ],
    )
    stream = read_file_stream(spark, src, SCHEMA, fmt="parquet")
    cfg = IngestCurationConfig(dedup_watermark="2 minutes")
    seen: list[tuple] = []

    def sink(batch_df, batch_id):
        seen.extend((r["doc_id"], r["content_hash"]) for r in batch_df.collect())

    q = start_curated_ingest(stream, sink, ckpt, cfg, query_name="ci_test")
    try:
        q.processAllAvailable()
        assert [d for d, _ in seen] == [1]
        # batch 2: same content redelivered (different doc_id/ts,
        # whitespace+case noise) within the watermark -> suppressed;
        # plus a genuinely new doc -> passes
        _write(
            spark,
            src,
            [
                (4, _t(0, 30), "  " + _GOOD.upper() + "  "),
                (5, _t(0, 31), "kilo lima mike november oscar papa quebec"),
            ],
        )
        q.processAllAvailable()
        assert sorted(d for d, _ in seen) == [1, 5]
        # batch 3: an event far past the watermark horizon evicts old
        # state; the SAME content as doc 1 then re-enters in batch 4
        _write(spark, src, [(6, _t(30, 0), "sierra tango uniform victor whiskey xray")])
        q.processAllAvailable()
        _write(spark, src, [(7, _t(30, 5), _GOOD)])
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(d for d, _ in seen)
    assert ids == [1, 5, 6, 7]  # 7 re-admitted after eviction
    # doc 1 and doc 7 carry the same normalized content hash
    hashes = dict(seen)
    assert hashes[1] == hashes[7]
