"""Scratch experiment: stateful-stream cost vs state partition count
(spark.sql.shuffle.partitions at query start — recorded in the
checkpoint, every micro-batch pays a state-store open/maintain/commit
per partition). Not part of the product surface.

Two modes:

- default: the r8 series over the window-agg suites. NOTE: since r8
  those queries pin their partitions via stream._bounded_session, so
  the conf flip below no longer reaches them — the mode is kept as
  the historical record of how _BOUNDED_STATE_PARTITIONS=8 was
  chosen (join_suite 11.4 @ 32 -> 4.6 @ 16 -> 2.8 @ 8 -> 2.3 @ 4;
  bytes_90s_suite 3.6 -> 2.2 -> 1.8 -> 1.7).
- ``running_totals``: r11 (r10 verdict #6) series for the
  applyInPandasWithState runner, which has a different profile (the
  hot cost is per-key Python invocation, so MORE partitions buy
  Python-worker parallelism up to a point): a fresh child session
  per count (bypassing _bounded_session's pin), end-to-end replay +
  last-emission postprocess. Measured sf0.1 median-of-3:
  4 -> 5.17, 8 -> 4.21, 16 -> 3.85, 32 -> 5.16; interleaved 8-vs-16
  A/B (6 rounds): 8 steady ~3.9, 16 steady ~3.6. 16's ~6-8% edge is
  inside window noise and the bounded session is SHARED — flipping
  the default to 16 would cost join_suite 1.6x — so 8 stays.

Usage: python tools/exp_stream_parts.py [runs] [running_totals]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kcbdml9_big_data_processing_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _child_session(parent, parts: str):
    bs = parent.newSession()
    for r in parent.sql("SET").collect():
        if r["key"].startswith("spark.sql."):
            try:
                bs.conf.set(r["key"], r["value"])
            except Exception:
                pass
    bs.conf.set("spark.sql.shuffle.partitions", parts)
    # r17: probe under the shipping condition — the bounded-session
    # maintenance deferral (stream.py r16) must cover the probe's own
    # sessions too, or the 60s engine default contaminates the series
    # with the very stall mode the fix removed (the interval is pinned
    # process-wide by the FIRST store load).
    bs.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    return bs


def run_running_totals(parent, runs: int) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kcbdml9_big_data_processing_spark.queries.stream import (
        _running_totals_source,
    )
    from kcbdml9_big_data_processing_spark.streaming.stateful import (
        running_totals,
    )

    src_path = _running_totals_source(parent, SF)
    i = 0
    for parts in ["4", "8", "16", "32"]:
        bs = _child_session(parent, parts)
        samples = []
        for _ in range(runs):
            i += 1
            t0 = time.time()
            src = (
                bs.readStream.schema("key string, cents long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src_path)
            )
            q = (
                running_totals(src, key_col="key", value_col="cents")
                .writeStream.format("memory")
                .queryName(f"rt_probe_{i}")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            em = bs.table(f"rt_probe_{i}")
            w = Window.partitionBy("key").orderBy(F.col("n_updates").desc())
            (
                em.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("key", F.col("total").alias("total_cents"))
            ).count()
            samples.append(round(time.time() - t0, 3))
            bs.catalog.dropTempView(f"rt_probe_{i}")
        med = sorted(samples)[len(samples) // 2]
        print(f"RESULT parts={parts} running_totals: median={med} {samples}", flush=True)


def run_window_suites(spark, runs: int) -> None:
    from kcbdml9_big_data_processing_spark.queries.stream import (
        stream_bytes_90s_suite,
        stream_join_suite,
    )

    for parts in ["32", "16", "8", "4"]:
        for name, fn in [
            ("join_suite", stream_join_suite),
            ("bytes_90s_suite", stream_bytes_90s_suite),
        ]:
            samples = []
            for _ in range(runs):
                spark.catalog.clearCache()
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                t0 = time.time()
                try:
                    fn(spark, SF).write.mode("overwrite").format("noop").save()
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", "32")
                samples.append(round(time.time() - t0, 3))
            med = sorted(samples)[len(samples) // 2]
            print(f"RESULT parts={parts} {name}: median={med} {samples}", flush=True)


def main():
    spark = get_spark(app_name="exp_stream_parts")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    numeric = [a for a in sys.argv[1:] if a.isdigit()]
    runs = int(numeric[0]) if numeric else 3
    if "running_totals" in sys.argv[1:]:
        run_running_totals(spark, runs)
    else:
        run_window_suites(spark, runs)
    spark.stop()


if __name__ == "__main__":
    main()
