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




def measure_incremental() -> None:
    """Incremental-vs-recensus cost at the heavy tier: classify the
    2,000 sf0.1 vectors (ids offset to avoid the replay self-rule) as
    a delta batch against the sf1 keeper set, vs re-running the full
    census over the union — the wall-clock argument for the
    incremental face.  Usage: python tools/measure_semdedup.py --incremental
    """
    from pyspark.sql import functions as F

    from acled_spark.ann import build_ivf_index, centroid_frame
    from acled_spark.queries.dedup import (
        SEMANTIC_EPS,
        semantic_classify_batch,
        semantic_dedup_census,
    )
    from acled_spark.session import get_spark
    from acled_spark.tables import load

    spark = get_spark(app_name="measure-semdedup-inc")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load(spark, ".benchdata/sf1", "embeddings")
    n = corpus.count()
    index = build_ivf_index(
        corpus, nlist=max(8, n // 64), max_iter=5, persist=True
    )
    cents = centroid_frame(spark, index.model)
    kept = (
        semantic_dedup_census(index.assigned, cents, eps=SEMANTIC_EPS)
        .filter("action = 'keep'")
        .select("vec_id")
        .join(index.assigned, "vec_id")
        .select("vec_id", "embedding", "cell")
        .localCheckpoint()
    )
    print(f"kept set: {kept.count()} of {n}")
    batch = load(spark, "/root/testdata/sf0.1", "embeddings").select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    )
    for label, run in (
        ("incremental classify (2k batch vs kept)",
         lambda: semantic_classify_batch(index, batch, kept)),
        ("full re-census over union (22k)",
         lambda: semantic_dedup_census(
             _assign_union(index, corpus, batch), cents)),
    ):
        times = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            run().write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        print(f"{label}: min {min(times):.2f} s over {PASSES}")
    index.unpersist()
    spark.stop()


def _assign_union(index, corpus, batch):
    from acled_spark.ann import _assign_cells

    union = corpus.select("vec_id", "embedding").unionByName(batch)
    return _assign_cells(index, union, "embedding", "vec_id").select(
        "vec_id", "embedding", "cell"
    )


if __name__ == "__main__":
    if "--incremental" in sys.argv:
        measure_incremental()
        raise SystemExit(0)
    raise SystemExit(main())
