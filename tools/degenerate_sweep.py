"""Degenerate-corpus sweep: run every registered query against an
EMPTY tier (0-row tables, real schemas), a TINY tier (1 row per
table), and an all-NULLS tier (non-key columns NULL) and report, per
query, whether it (a) returns a well-formed DataFrame, (b) raises a
documented ValueError, or (c) crashes with an undocumented error
class (IndexError / TypeError / AttributeError / Py4J internals) --
class (c) is the bug list for the degenerate-data review lens.

Usage: python tools/degenerate_sweep.py [--tier empty|tiny|nulls|all] [--only a,b]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

SRC = "/root/testdata/sf0.001"


TIERS = ("empty", "tiny", "nulls")


def write_tier(spark, out_dir: str, tier: str) -> str:
    """Materialize ONE degenerate tier derived from sf0.001 schemas —
    the single definition shared with tests/test_degenerate_corpus.py
    (round-11 review: two hand-maintained copies would let the lens
    and its regression pins silently cover different corpora).

    empty = 0 rows; tiny = 1 row; nulls = 3 rows per table with every
    column except the first (the table's id/key) set to NULL — the
    "bad ingest day" shape: NULL timestamps under windows, NULL text
    under tokenizers, NULL embeddings under vector math, NULL join
    keys.
    """
    from pyspark.sql import functions as F

    if tier not in TIERS:
        raise ValueError(f"unknown tier {tier!r}; expected one of {TIERS}")
    n = {"empty": 0, "tiny": 1, "nulls": 3}[tier]
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet").limit(n)
        if tier == "nulls":
            keep = df.columns[0]
            df = df.select(
                keep,
                *[
                    F.lit(None).cast(df.schema[c].dataType).alias(c)
                    for c in df.columns[1:]
                ],
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    return out_dir


def materialize(spark, base: str) -> dict[str, str]:
    out = {}
    for tier in TIERS:
        d = os.path.join(base, tier)
        if not os.path.isdir(d):
            os.makedirs(d, exist_ok=True)
            write_tier(spark, d, tier)
        out[tier] = d
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    args = sys.argv[1:]
    tier_arg = "all"
    only = None
    if "--tier" in args:
        i = args.index("--tier")
        tier_arg = args[i + 1]
        del args[i : i + 2]
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("degenerate-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/degenerate_tiers"
    tiers = materialize(spark, base)
    if tier_arg != "all":
        if tier_arg not in tiers:
            raise SystemExit(
                f"--tier must be one of {sorted(tiers)} or 'all', got {tier_arg!r}"
            )
        tiers = {tier_arg: tiers[tier_arg]}

    qs = E.queries()
    if only:
        qs = {n: qs[n] for n in qs if n in only}

    bugs = []
    for tier, sf in tiers.items():
        print(f"=== tier {tier} ({sf}) ===", flush=True)
        for name in qs:
            t0 = time.time()
            try:
                sdf = qs[name](spark, sf)
                rows = sdf.collect()
                status = f"ok rows={len(rows)}"
            except ValueError as exc:
                status = f"ValueError: {str(exc)[:90]}"
            except Exception as exc:  # noqa: BLE001
                status = f"BUG {type(exc).__name__}: {str(exc)[:200]}"
                bugs.append((tier, name, type(exc).__name__, str(exc)[:400]))
            print(f"  {name:34s} {status}  ({time.time()-t0:.1f}s)", flush=True)

    print(f"\n{len(bugs)} undocumented-crash bugs")
    for tier, name, cls, msg in bugs:
        print(f"  [{tier}] {name}: {cls}: {msg}")
    return 1 if bugs else 0


if __name__ == "__main__":
    raise SystemExit(main())
