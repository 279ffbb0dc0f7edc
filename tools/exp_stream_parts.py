"""Scratch experiment: does lowering spark.sql.shuffle.partitions for
the STATEFUL streaming queries cut their fixed per-micro-batch cost
at sf0.1? State partition count is fixed from the conf when the
query first starts; a bounded replay with tiny per-partition state
pays 32 partitions of state-store open/commit per batch. Not part of
the product surface."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kcbdml9_big_data_processing_spark.queries.stream import (
    stream_bytes_90s_suite,
    stream_join_suite,
)
from kcbdml9_big_data_processing_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark(app_name="exp_stream_parts")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
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
    spark.stop()


if __name__ == "__main__":
    main()
