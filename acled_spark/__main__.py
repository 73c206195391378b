"""Command-line entry point: run any registered query, show its plan,
list the library, or run real HTTP ingestion into bronze.

    python -m acled_spark list
    python -m acled_spark run a4_daily_rollup --sf-dir /root/testdata/sf0.01 -n 20
    python -m acled_spark explain j5_multiway_revenue
    python -m acled_spark oracle a4_daily_rollup      # print the DuckDB oracle
    python -m acled_spark sql "SELECT lang, count(*) FROM documents GROUP BY lang"
    ACLED_USERNAME=u ACLED_PASSWORD=p \\
      python -m acled_spark ingest --bronze /data/bronze \\
        --start 2024-01-01 --end 2024-01-03

Credentials come from environment variables (never argv — process
lists are world-readable); names configurable via --username-env /
--password-env.
"""

from __future__ import annotations

import argparse
import sys

from acled_spark.tables import DEFAULT_SF_DIR


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="acled_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    for name in ("run", "explain", "oracle"):
        p = sub.add_parser(name)
        p.add_argument("query")
        if name in ("run", "explain"):
            p.add_argument(
                "--sf-dir", default=DEFAULT_SF_DIR, dest="sf_dir"
            )
        if name == "run":
            p.add_argument("-n", "--rows", type=int, default=20)

    pi = sub.add_parser(
        "ingest", help="fetch day partitions over HTTP into bronze"
    )
    pi.add_argument("--bronze", required=True, help="bronze table path")
    pi.add_argument(
        "--silver",
        help="silver table path; when set, each day runs the FULL "
        "lifecycle (fetch -> bronze checks -> bronze -> keyed silver "
        "upsert -> silver checks) instead of bronze-only",
    )
    pi.add_argument("--start", required=True, help="first day (YYYY-MM-DD)")
    pi.add_argument("--end", help="last day inclusive; default = start")
    pi.add_argument("--base-url", default="https://acleddata.com")
    pi.add_argument("--endpoint", default="acled/read")
    pi.add_argument("--limit", type=int, default=5000)
    pi.add_argument("--username-env", default="ACLED_USERNAME")
    pi.add_argument("--password-env", default="ACLED_PASSWORD")

    ps = sub.add_parser(
        "sql",
        help="run ad-hoc Spark SQL with the testdata tables registered "
        "as views (the reference's raw-SQL reporting workflow)",
    )
    ps.add_argument("statement", help="a single SQL statement")
    ps.add_argument("--sf-dir", default=DEFAULT_SF_DIR, dest="sf_dir")
    ps.add_argument("-n", "--rows", type=int, default=20)
    ps.add_argument(
        "--explain", action="store_true", help="show the physical plan instead"
    )

    pr = sub.add_parser(
        "report", help="assemble KPIs and write text/JSON (+gated PDF/PNG) artifacts"
    )
    pr.add_argument("--sf-dir", default=DEFAULT_SF_DIR, dest="sf_dir")
    pr.add_argument("--out-dir", required=True)
    pr.add_argument(
        "--pdf", action="store_true",
        help="also render the matplotlib PDF (errors if matplotlib absent)",
    )
    pr.add_argument(
        "--heatmap-png", action="store_true",
        help="also render the pygal choropleth PNG (errors if pygal absent)",
    )

    args = parser.parse_args(argv)

    if args.cmd == "ingest":
        return _ingest(args)
    if args.cmd == "report":
        return _report(args)
    if args.cmd == "sql":
        return _sql(args)

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
    # the explain subparser defines no --rows; _render ignores it there
    _render(df, explain=args.cmd == "explain", rows=getattr(args, "rows", 20))
    return 0


def _render(df, explain: bool, rows: int) -> None:
    """One output policy for every frame-producing subcommand."""
    if explain:
        df.explain(mode="formatted")
    else:
        df.show(rows, truncate=False)


def _sql(args) -> int:
    """Ad-hoc SQL over the registered tables — the migration path for
    the reference's ~15 raw report queries: point the statement at the
    same view names the oracle gate uses (region nation customer
    supplier part orders lineitem events documents embeddings)."""
    from acled_spark.session import get_spark
    from acled_spark.tables import register_views

    spark = get_spark(app_name="acled-spark-sql")
    register_views(spark, args.sf_dir)
    _render(spark.sql(args.statement), explain=args.explain, rows=args.rows)
    return 0


def _ingest(args) -> int:
    """Real ingestion: HTTP fetch -> typed cast -> bronze partitions.

    The CLI face of the reference's backfill job (jobs.py:8-12): every
    missing day in [start, end] is fetched through the OAuth'd page
    loop and written as one date partition; re-runs only fetch days
    whose partitions are absent.
    """
    import os
    from datetime import date

    from acled_spark.http_client import make_http_fetcher
    from acled_spark.scheduler import missing_partitions, run_backfill
    from acled_spark.source import EmptyPartitionError
    from acled_spark.session import get_spark
    from acled_spark.source import partition_days

    username = os.environ.get(args.username_env)
    password = os.environ.get(args.password_env)
    if not username or not password:
        print(
            f"ingest: set ${args.username_env} and ${args.password_env} "
            "(see --username-env/--password-env)",
            file=sys.stderr,
        )
        return 2
    start = date.fromisoformat(args.start)
    end = date.fromisoformat(args.end) if args.end else start
    fetcher = make_http_fetcher(
        username, password, base_url=args.base_url, endpoint=args.endpoint
    )
    spark = get_spark(app_name="acled-spark-ingest")
    if args.silver:
        from acled_spark.pipeline import promote_day, run_day

        # A day can be materialized in bronze but absent from silver
        # (e.g. an earlier bronze-only run of the same range) — gating
        # on bronze alone would skip it forever, but re-FETCHING it
        # would re-download data that already sits in bronze.  So:
        # bronze-missing days run the full fetch lifecycle; days only
        # missing from silver promote the existing bronze partition.
        # Both paths are replay-safe for half-done days.
        all_days = partition_days(start, end)
        # route the session in: partition discovery must go through the
        # Hadoop FS API or a remote store (s3a://...) looks empty and
        # every run re-ingests the full range (scheduler.py contract)
        miss_bronze = set(missing_partitions(args.bronze, all_days, spark))
        miss_silver = set(missing_partitions(args.silver, all_days, spark))
        todo = sorted(miss_bronze | miss_silver)
        done = []
        for day in todo:
            if day in miss_bronze:
                try:
                    result = run_day(
                        spark, fetcher, day, args.bronze, args.silver,
                        page_limit=args.limit,
                    )
                except EmptyPartitionError:
                    # a zero-row day can never materialize a partition:
                    # skipping (like run_backfill) keeps the range
                    # moving and avoids the re-run wedge where every
                    # invocation dies at the same empty day
                    print(f"{day.isoformat()}: empty day, skipped")
                    continue
            else:
                result = promote_day(spark, day, args.bronze, args.silver)
            done.append(day)
            checks = result.bronze_checks + result.silver_checks
            print(
                f"{day.isoformat()}: {result.rows} rows, "
                f"{sum(c.passed for c in checks)}/{len(checks)} checks passed"
            )
    else:
        done = run_backfill(
            spark, fetcher, args.bronze, partition_days(start, end), limit=args.limit
        )
    print(f"materialized {len(done)} partition(s): "
          + ", ".join(d.isoformat() for d in done))
    return 0


def _report(args) -> int:
    """The reference's daily-report job as one CLI call: KPI assembly
    from the oracle-checked query library, then every renderer whose
    dependency is present (text/JSON always; PDF/PNG opt-in gated)."""
    import os

    from acled_spark.report import (
        compute_kpis,
        compute_region_counts,
        render_heatmap_json,
        render_json,
        render_text,
    )
    from acled_spark.session import get_spark

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark(app_name="acled-spark-report")
    kpis = compute_kpis(spark, args.sf_dir)
    counts = compute_region_counts(spark, args.sf_dir)
    written = [
        render_text(kpis, os.path.join(args.out_dir, "report.txt")),
        render_json(kpis, os.path.join(args.out_dir, "report.json")),
        render_heatmap_json(counts, os.path.join(args.out_dir, "heatmap.json")),
    ]
    if args.pdf:
        from acled_spark.report import render_pdf

        written.append(render_pdf(kpis, os.path.join(args.out_dir, "report.pdf")))
    if args.heatmap_png:
        from acled_spark.report import render_heatmap_png

        written.append(
            render_heatmap_png(counts, os.path.join(args.out_dir, "heatmap.png"))
        )
    print("wrote: " + ", ".join(written))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
