"""Heavy-tier corpus-linearity measurement for the banded-Hamming
image near-dup core (VERDICT r9 #3 second half / r10 #4) — the
SCALE.md §phash-heavy row.

Runs the UNBOUNDED ``phash_band_pairs`` pipeline (no _PHASH_DOCS cut)
over the full documents corpus at sf0.1 (5k docs) and sf1.0 (50k
docs, the 10x near-dup-replicated tier) and reports wall-clock, pair
volume, and the band-bucket census — the evidence that corpus-side
cost is ~linear (one Arrow hash pass + a ~40 B/doc exchange) while
pair volume tracks the DUPLICATE structure, not corpus size.

Usage: python tools/measure_phash_scale.py [sf01_dir] [heavy_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

RUNS = 3


def measure(spark, sf_dir):
    from pyspark.sql import functions as F

    from acled_spark.queries.multimodal_q import (
        _PHASH_NEAR,
        phash_band_pairs,
        phash_source_docs,
    )

    docs = phash_source_docs(spark, sf_dir)
    n_docs = docs.count()
    best = float("inf")
    agg = None
    for _ in range(RUNS):
        t0 = time.time()
        agg = (
            phash_band_pairs(docs)
            .agg(
                F.count("*").alias("pairs"),
                F.sum(
                    F.when(F.col("hamming") <= _PHASH_NEAR, 1).otherwise(0)
                ).alias("near"),
            )
            .collect()[0]
        )
        best = min(best, time.time() - t0)
    return n_docs, best, agg["pairs"], agg["near"]


def main() -> int:
    from pyspark.sql import SparkSession

    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    heavy = sys.argv[2] if len(sys.argv) > 2 else ".benchdata/sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("measure-phash-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the Arrow + HOF codegen shapes once so the first tier's
    # numbers aren't compile-dominated
    measure(spark, "/root/testdata/sf0.01")

    for name, d in (("sf0.1", sf01), ("sf1.0", heavy)):
        n, t, pairs, near = measure(spark, d)
        print(f"{name}: docs={n} time={t:.2f}s pairs={pairs} near={near}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
