"""Command-line entry point: run any registered query, show its plan,
or list the library.

    python -m acled_spark list
    python -m acled_spark run a4_daily_rollup --sf-dir /root/testdata/sf0.01 -n 20
    python -m acled_spark explain j5_multiway_revenue
    python -m acled_spark oracle a4_daily_rollup      # print the DuckDB oracle
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="acled_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    for name in ("run", "explain", "oracle"):
        p = sub.add_parser(name)
        p.add_argument("query")
        if name in ("run", "explain"):
            p.add_argument(
                "--sf-dir", default="/root/testdata/sf0.01", dest="sf_dir"
            )
        if name == "run":
            p.add_argument("-n", "--rows", type=int, default=20)

    args = parser.parse_args(argv)

    from acled_spark.registry import all_specs

    specs = all_specs()

    if args.cmd == "list":
        width = max(len(n) for n in specs)
        for n, spec in sorted(specs.items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            tags = ",".join(spec.tags)
            print(f"{n:<{width}}  [{oracle}] {tags}")
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; see `python -m acled_spark list`",
              file=sys.stderr)
        return 2
    spec = specs[args.query]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("-- no oracle (rows-only check by design)")
        else:
            print(spec.oracle.strip())
        return 0

    from acled_spark.session import get_spark

    spark = get_spark(app_name=f"acled-spark-{args.cmd}")
    df = spec.builder(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain(mode="formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
