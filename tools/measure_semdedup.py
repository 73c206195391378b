"""Measure dedup_semantic's two levers at the heavy tier (round 13).

The sf1 heavy tier (tools/gen_heavy_tier.py) gives every sf0.1 vector
nine deterministically-perturbed near-duplicate copies — a 20,000-
vector corpus whose TRUE semantic-duplicate structure is known by
construction (each 10-copy family should collapse to one keeper), so
the sweep measures BOTH cost and recall:

- ``cell_target`` (quantizer cell sizing): total within-cell pair
  count is ~n*cell/2 — the wall-clock lever; smaller cells can split
  a duplicate family across a boundary — the recall cost.
- ``eps`` (duplicate threshold): the artifact-size lever — how many
  of the known near-dup copies each threshold actually flags.

Recall here = dropped planted copies / planted copies (18,000: nine
of every ten family members are redundant; the family keeper is not
over-counted because family ids share vec_id % 100_000_000).

Run on an IDLE box (SCALE.md bench methodology); min over PASSES
timed runs per cell, one shared SparkSession, results printed as a
markdown table for SCALE.md §semdedup.

Usage: python tools/measure_semdedup.py [sf_dir]   (default .benchdata/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 3


def main() -> int:
    from pyspark.sql import functions as F

    from acled_spark.queries.dedup import dedup_semantic
    from acled_spark.session import get_spark
    from acled_spark.tables import load

    sf = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    spark = get_spark(app_name="measure-semdedup")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, sf, "embeddings")
    n = emb.count()
    n_families = emb.select(
        (F.col("vec_id") % 100_000_000).alias("f")
    ).distinct().count()
    planted = n - n_families
    print(f"corpus: {n} vectors, {n_families} families, "
          f"{planted} planted near-dup copies\n")

    print("| cell_target | eps | wall (min of "
          f"{PASSES}) | dropped | planted recall |")
    print("|---|---|---|---|---|")
    for cell_target in (64, 256, 1024):
        for eps in (0.95, 0.99):
            times, dropped, recall = [], None, None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                out = dedup_semantic(
                    spark, sf, eps=eps, cell_target=cell_target
                )
                drops = out.filter(F.col("action") == "drop").select(
                    "vec_id", (F.col("vec_id") % 100_000_000).alias("f"),
                    (F.col("dup_of") % 100_000_000).alias("df"),
                )
                agg = drops.agg(
                    F.count("*").alias("n"),
                    F.sum((F.col("f") == F.col("df")).cast("long")).alias(
                        "same_family"
                    ),
                ).collect()[0]
                times.append(time.perf_counter() - t0)
                dropped, same_fam = agg["n"], agg["same_family"] or 0
                recall = same_fam / planted
            print(
                f"| {cell_target} | {eps} | {min(times):.2f} s "
                f"| {dropped} | {recall:.3f} |",
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
