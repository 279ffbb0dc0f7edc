"""applyInPandasWithState: cross-batch state accumulation, pinned with
controlled micro-batch boundaries (one file per trigger)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from kcbdml9_big_data_processing_spark.sources.files import read_file_stream
from kcbdml9_big_data_processing_spark.streaming.stateful import running_totals

SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("key", T.StringType(), True),
        T.StructField("bytes", T.LongType(), True),
    ]
)


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")

    def feed(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    t0 = dt.datetime(2024, 1, 1)
    feed([(t0, "a", 10), (t0, "a", 20), (t0, "b", 5)])

    stream = read_file_stream(spark, src, SCHEMA, fmt="parquet", max_files_per_trigger=1)
    out = running_totals(stream, key_col="key", value_col="bytes")

    emitted: list[tuple] = []

    def sink(batch_df, batch_id: int) -> None:
        emitted.extend(
            (r["key"], r["total"], r["n_updates"]) for r in batch_df.collect()
        )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert ("a", 30, 1) in emitted and ("b", 5, 1) in emitted
        # second batch: state carries forward
        feed([(t0, "a", 70)])
        q.processAllAvailable()
    finally:
        q.stop()

    assert ("a", 100, 2) in emitted  # 30 + 70 across two micro-batches
    # b had no new data in batch 2 -> not re-emitted
    assert [e for e in emitted if e[0] == "b"] == [("b", 5, 1)]
