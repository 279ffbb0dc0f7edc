"""Dump ``explain("formatted")`` for registered queries to files.

    PYTHONPATH=/root/repo python tools/dump_explains.py OUTDIR SUFFIX [QUERY...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each named query (default:
every batch query). Streaming rows are skipped — their plan is per
micro-batch. Used by the r16 optimization round to commit
before/after plan evidence under plans/r16/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kcbdml9_big_data_processing_spark.queries import QUERIES
    from kcbdml9_big_data_processing_spark.session import get_spark

    spark = get_spark(app_name="dump_explains")
    os.makedirs(outdir, exist_ok=True)
    if not names:
        names = [n for n in QUERIES if not n.startswith("stream_")]
    for name in names:
        if name.startswith("stream_"):
            print(f"skip {name} (streaming)", flush=True)
            continue
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            txt = f"ERROR constructing plan: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
