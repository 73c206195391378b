"""Full LOCAL driver simulation: every oracle-backed query side-by-side
with its DuckDB oracle at sf0.01 on a PLAIN SparkSession — the exact
shape of the driver's correctness gate, run before each round closes so
oracle breakage is caught before CORRECTNESS_r0N does.

Usage: python tools/driver_sim.py [sf_dir] [--only name1,name2,...]
       python tools/driver_sim.py --tier adversarial [--only ...]

``--tier adversarial`` resolves (and lazily generates) the planted
boundary corpus from tools/gen_adversarial_tier.py and runs the same
full parity suite against it — the standing structural answer to the
r12 mutation lens's corpus-shaped-blindness finding.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.conftest import normalize

    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    tier = None
    if "--tier" in args:
        i = args.index("--tier")
        tier = args[i + 1]
        del args[i : i + 2]
    if tier is not None:
        if tier != "adversarial":
            raise SystemExit(f"unknown tier: {tier}")
        from tools.gen_adversarial_tier import ensure

        sf = ensure()
    else:
        sf = args[0] if args else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    rows = E.entry(spark).collect()
    print(f"entry: {len(rows)} rows", flush=True)

    qs, osql = E.queries(), E.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"--only names not in queries(): {sorted(unknown)}")
        qs = {n: qs[n] for n in qs if n in only}
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    t0 = time.time()
    failed = []
    for i, name in enumerate(qs):
        # per-query error capture: one crashing query must not abort the
        # suite — on the adversarial tier a planted boundary row CAN
        # surface a genuine runtime error (e.g. ANSI divide-by-zero),
        # and that error is a finding to record, not a reason to stop
        try:
            sdf = qs[name](spark, sf)
            s_cols, s_rows = normalize(
                list(sdf.columns), [tuple(r) for r in sdf.collect()]
            )
        except Exception as exc:  # noqa: BLE001 - triage tool
            msg = str(exc).splitlines()[0][:160]
            print(f"[{i + 1}/{len(qs)}] {name}: ERROR {msg}", flush=True)
            failed.append(name)
            continue
        if name not in osql:
            print(f"[{i + 1}/{len(qs)}] {name}: rows-only ({len(s_rows)})", flush=True)
            continue
        try:
            res = con.execute(osql[name])
        except Exception as exc:  # noqa: BLE001 - triage tool
            msg = str(exc).splitlines()[0][:160]
            print(f"[{i + 1}/{len(qs)}] {name}: ORACLE-ERROR {msg}", flush=True)
            failed.append(name)
            continue
        d_cols, d_rows = normalize(
            [d[0] for d in res.description], [tuple(r) for r in res.fetchall()]
        )
        ok = (
            s_cols == d_cols
            and len(s_rows) == len(d_rows)
            and [tuple(map(str, r)) for r in s_rows]
            == [tuple(map(str, r)) for r in d_rows]
        )
        print(
            f"[{i + 1}/{len(qs)}] {name}: {'MATCH' if ok else 'MISMATCH'}"
            f" ({len(s_rows)} rows)",
            flush=True,
        )
        if not ok:
            failed.append(name)
            if s_cols != d_cols:
                print(f"  cols spark={s_cols}\n  cols duck ={d_cols}")
            for a, b in list(zip(s_rows, d_rows))[:3]:
                if tuple(map(str, a)) != tuple(map(str, b)):
                    print(f"  S {a}\n  D {b}")
    print(
        f"driver-sim: {len(qs) - len(failed)}/{len(qs)} ok in "
        f"{time.time() - t0:.0f}s; failures: {failed}",
        flush=True,
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
