"""Ad-hoc single-query timer: steady-state median-of-N for one or more
registered queries at an SF dir — the same methodology as bench.py
(noop-sink materialization, clearCache between runs) without paying
the full 50-query sweep while iterating on one operator.

Usage: python tools/time_query.py QUERY [QUERY...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from kcbdml9_big_data_processing_spark.queries import QUERIES
    from kcbdml9_big_data_processing_spark.session import get_spark

    spark = get_spark(app_name="time_query")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in args.queries:
        spec = QUERIES[name]
        # warm-up run at the target SF (codegen + file index)
        spec.fn(spark, args.sf).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            spec.fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        med = sorted(samples)[len(samples) // 2]
        print(f"{name}: median={med} samples={samples}")
    spark.stop()


if __name__ == "__main__":
    main()
