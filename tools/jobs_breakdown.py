"""Per-job breakdown of one registered query's execution (r16).

Runs the query once (after a warm-up) under a job group and prints
every Spark job the run launched — submission order, inter-job driver
gap, task count, and wall — from the driver's AppStatusStore. This is
the diagnostic that attributed curation_run's 8.8 s to ~40 sub-second
jobs plus ~2.6 s of inter-job Catalyst gaps (no single job to
attack), and found the AQE byte-coalesced 3-task cosine stage in
embedding_near_dup.

Usage: PYTHONPATH=/root/repo python tools/jobs_breakdown.py QUERY [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from kcbdml9_big_data_processing_spark.queries import QUERIES
    from kcbdml9_big_data_processing_spark.session import get_spark

    spark = get_spark(app_name="jobs_breakdown")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spec = QUERIES[args.query]
    spec.fn(spark, args.sf).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    group = "bd"
    sc.setJobGroup(group, args.query)
    t0 = time.time()
    df = spec.fn(spark, args.sf)
    t1 = time.time()
    df.write.mode("overwrite").format("noop").save()
    t2 = time.time()
    sc.setJobGroup(None, None)
    print(f"build={t1 - t0:.3f} exec={t2 - t1:.3f}")
    ids = set(sc.statusTracker().getJobIdsForGroup(group))
    store = sc._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() not in ids:
            continue
        sub, comp = j.submissionTime(), j.completionTime()
        wall = (
            (comp.get().getTime() - sub.get().getTime()) / 1000.0
            if sub.isDefined() and comp.isDefined()
            else None
        )
        start = sub.get().getTime() / 1000.0 if sub.isDefined() else 0.0
        rows.append((start, j.jobId(), j.numTasks(), wall, j.name()[:95]))
    rows.sort()
    tprev = None
    for start, jid, nt, wall, nm in rows:
        gap = f"{start - tprev:6.3f}" if tprev is not None else "      "
        tprev = start + (wall or 0.0)
        print(f"job {jid:4d} gap={gap} tasks={nt:4d} wall={wall:6.3f}  {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
