"""Benchmark harness: times every registered query at sf0.1.

Prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is materialized with the noop datasource writer — full
computation (scan→shuffle→agg) with zero driver-side collect cost, so
the number reflects the engine, not Py4J row transfer.

Env: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     $SPARK_GRAFT_CPUS (default os.cpu_count()).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# excluded from timing: performs a full archive write inside the query
# (round-trip correctness proof, not a read-path benchmark)
EXCLUDE = {"archive_partition_roundtrip"}


def main() -> None:
    from kcbdml9_big_data_processing_spark.queries import QUERIES
    from kcbdml9_big_data_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")

    # warm-up: JVM/codegen startup plus one footer-read per table so
    # file-index building doesn't land on whichever query runs first
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from kcbdml9_big_data_processing_spark.schemas import TESTDATA_TABLES
    from kcbdml9_big_data_processing_spark.sources.parquet import read_table

    for t in TESTDATA_TABLES:
        try:
            read_table(spark, sf_dir, t).limit(1).collect()
        except Exception:
            pass
    # absorb remaining one-time engine costs — first shuffle exchange,
    # hash-agg codegen, noop-datasource class load — measured at ~2.5 s
    # on whichever query runs first if not paid here
    (
        read_table(spark, sf_dir, "region")
        .groupBy("r_name")
        .count()
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    times: dict[str, float] = {}
    for name, spec in QUERIES.items():
        if name in EXCLUDE:
            continue
        t0 = time.time()
        try:
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # record the failure, keep benching
            print(f"bench error {name}: {e}", file=sys.stderr)
            times[name] = -1.0
        # isolate queries: several persist() intermediates (dedup
        # signatures, LSH features) as part of their plan; left cached
        # they pile up across 60 queries and the GC pressure skews
        # every later measurement (observed 3-15x inflation)
        spark.catalog.clearCache()

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "all_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "regressions": _regressions(times),
            }
        )
    )


#: flag a query slower than this multiple of its prior-round time
#: (with a 0.5 s floor so sub-second noise can't trip the gate)
_REGRESSION_FACTOR = 1.5


def _latest_baseline() -> str | None:
    """Most recent BENCH_r{N}.json next to this file."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    return rounds[-1] if rounds else None


def _regressions(times: dict[str, float]) -> dict[str, dict[str, float]]:
    """Compare per-query times against the latest recorded round's
    bench and report queries that got >1.5x slower — so a round can't
    silently regress performance while staying correctness-green."""
    path = _latest_baseline()
    try:
        with open(path) as f:
            prior = json.load(f)
        prior_times = prior.get("parsed", prior).get("queries", {})
    except Exception:
        return {}
    flagged = {}
    for name, now in times.items():
        then = prior_times.get(name)
        if then is None or then <= 0 or now < 0:
            continue
        if now > max(then * _REGRESSION_FACTOR, 0.5):
            flagged[name] = {"prev_sec": then, "now_sec": now}
    return flagged


if __name__ == "__main__":
    main()
