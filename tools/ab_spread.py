"""Interleaved same-session A/B of the spread_scan optimization.

This host has noisy-neighbor windows that dominate sequential
comparisons (two back-to-back time_query runs of the SAME code can
differ 2x), so per-change evidence must interleave: alternate
spread-ON / spread-OFF executions of each query within one session and
compare medians — window drift hits both arms equally.

    PYTHONPATH=/root/repo python tools/ab_spread.py QUERY [QUERY...]
        [--reps N] [--sf DIR]

The OFF arm flips sources.parquet._SPREAD_DISABLED and clears the
prepared-plan cache so both arms rebuild their plans per run.
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from kcbdml9_big_data_processing_spark.queries import QUERIES, registry
    from kcbdml9_big_data_processing_spark.session import get_spark
    from kcbdml9_big_data_processing_spark.sources import parquet as P

    spark = get_spark(app_name="ab_spread")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def one(name: str, disabled: bool) -> float:
        P._SPREAD_DISABLED = disabled
        registry._PREPARED_PLANS.clear()
        t0 = time.time()
        QUERIES[name].fn(spark, args.sf).write.mode("overwrite").format(
            "noop"
        ).save()
        dt = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        return dt

    for name in args.queries:
        # one unmeasured warm-up per arm (codegen, file index, stores)
        one(name, False)
        one(name, True)
        on, off = [], []
        for _ in range(args.reps):
            on.append(one(name, False))
            off.append(one(name, True))
        med = lambda s: sorted(s)[len(s) // 2]
        print(
            f"{name}: ON(spread) median={med(on)} {on}\n"
            f"{name}: OFF        median={med(off)} {off}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
