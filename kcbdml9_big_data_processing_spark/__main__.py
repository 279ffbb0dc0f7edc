"""CLI: run a registered query against a testdata directory.

    python -m kcbdml9_big_data_processing_spark QUERY [--sf DIR]
        [--out PATH] [--limit N] [--explain] [--list]

A user of the reference's two hardcoded mains gets the same
run-a-job-from-the-shell ergonomics, parameterized over every query
in the registry: results print as a table (first ``--limit`` rows) or
land in parquet with ``--out``; ``--explain`` prints the formatted
physical plan instead of executing.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kcbdml9-spark")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="testdata dir")
    ap.add_argument("--out", help="write full result as parquet to this path")
    ap.add_argument("--limit", type=int, default=20, help="rows to print")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan only"
    )
    ap.add_argument(
        "--list", action="store_true", help="list registered queries and exit"
    )
    args = ap.parse_args(argv)

    from .queries import QUERIES

    if args.list or not args.query:
        for name, spec in QUERIES.items():
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name}  [{oracle}]")
        return 0
    spec = QUERIES.get(args.query)
    if spec is None:
        print(f"unknown query: {args.query} (try --list)", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(app_name=f"kcbdml9-{args.query}")
    try:
        df = spec.fn(spark, args.sf)
        if args.explain:
            df.explain("formatted")
        elif args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            df.show(args.limit, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
