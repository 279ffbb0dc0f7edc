"""Process-level interleaved A/B: alternate fresh-process legs with a
module flag at its shipping value (ON) vs forced to a given value
(OFF). For effects that are baked in at per-process store/build time
(store layout, session confs), where tools/ab_flags.py's same-session
alternation cannot flip the arm.

    PYTHONPATH=/root/repo python tools/ab_process.py QUERY [QUERY...]
        --flag module.attr=VALUE [--legs N] [--runs N] [--sf DIR]

Each leg spawns one ON and one OFF subprocess (order alternates per
leg); each subprocess warms up (building its per-process stores under
its arm's flag), then times the queries median-of-N with the noop
sink. Window drift hits both arms equally across legs.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_CHILD = r"""
import ast, importlib, json, os, sys, time
sys.path.insert(0, {root!r})
for spec in {flags!r}:
    target, _, raw = spec.partition("=")
    modname, _, attr = target.rpartition(".")
    setattr(importlib.import_module(modname), attr, ast.literal_eval(raw))
from kcbdml9_big_data_processing_spark.queries import QUERIES
from kcbdml9_big_data_processing_spark.session import get_spark
spark = get_spark(app_name="ab_process")
spark.range(1_000_000).selectExpr("sum(id)").collect()
out = {{}}
for name in {queries!r}:
    QUERIES[name].fn(spark, {sf!r}).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    samples = []
    for _ in range({runs!r}):
        t0 = time.time()
        QUERIES[name].fn(spark, {sf!r}).write.mode("overwrite").format("noop").save()
        samples.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    out[name] = samples
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_child(queries, sf, runs, flags):
    code = _CHILD.format(root=ROOT, flags=flags, queries=queries, sf=sf, runs=runs)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": ROOT},
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"child failed: rc={p.returncode}\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--flag", action="append", required=True)
    ap.add_argument("--legs", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    ons: dict[str, list[float]] = {q: [] for q in args.queries}
    offs: dict[str, list[float]] = {q: [] for q in args.queries}
    for leg in range(args.legs):
        arms = [("on", []), ("off", args.flag)]
        if leg % 2:
            arms.reverse()
        for arm, flags in arms:
            res = run_child(args.queries, args.sf, args.runs, flags)
            tgt = ons if arm == "on" else offs
            for q, samples in res.items():
                tgt[q].extend(samples)
            print(f"leg {leg} {arm}: {res}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    for q in args.queries:
        print(
            f"{q}: ON(median)={med(ons[q])} OFF(median)={med(offs[q])}"
            f"  on={ons[q]} off={offs[q]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
