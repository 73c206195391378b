"""Measured capped-vs-uncapped table for embedding_cosine_pairs'
``max_block`` lever (VERDICT r8 #1) — the SCALE.md §max_block rows.

Protocol mirrors the r8 ``max_bucket`` table: one warmed session,
min over N runs of the registered query shape (pairs → top-20 by
cosine), pair volume counted once per variant.  Two corpora: the
natural sf1.0 heavy tier (10 uniform ~2,000-vector quantizer cells —
no tail, cap must be a no-op) and a planted-skew tier (natural +
ONE 20,000-vector near-constant block under a fresh label — the
runaway-quantizer-cell shape the cap exists to bound).

Usage: python tools/measure_max_block.py [heavy_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

PLANTED = 20_000
RUNS = 3


def top20(pairs_df):
    from pyspark.sql import functions as F

    return [
        (r["vec1"], r["vec2"])
        for r in pairs_df.orderBy(F.desc("cosine"), "vec1", "vec2")
        .limit(20)
        .collect()
    ]


def timed_top20(pairs_builder, runs=RUNS):
    best, out = float("inf"), None
    for _ in range(runs):
        t0 = time.time()
        out = top20(pairs_builder())
        best = min(best, time.time() - t0)
    return best, out


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from acled_spark.profiling import profile_blocks
    from acled_spark.queries.dedup import embedding_cosine_pairs
    from acled_spark.queries.similarity import DIM
    from acled_spark.tables import load

    heavy = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("measure-max-block")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, heavy, "embeddings").filter(F.size("embedding") == DIM)
    emb.count()
    # warm the pair-join codegen shapes too: the first HOF-heavy run
    # pays one-off compilation (~5 s) that would bias the first cell
    top20(embedding_cosine_pairs(emb))

    p = profile_blocks(emb)
    print(
        f"natural profile: n_keys={p.n_keys} max={p.max_size} "
        f"p50={p.p50} rec={p.recommended_cap}"
    )
    t_nat, ref20 = timed_top20(lambda: embedding_cosine_pairs(emb))
    n_nat = embedding_cosine_pairs(emb).count()
    print(f"natural uncapped: {t_nat:.2f}s  pairs={n_nat}")
    t_noop, noop20 = timed_top20(
        lambda: embedding_cosine_pairs(emb, max_block=2500)
    )
    print(
        f"natural max_block=2500 (no-op, cap>max): {t_noop:.2f}s  "
        f"top20 {sum(a == b for a, b in zip(noop20, ref20))}/20 vs uncapped"
    )

    planted = emb.unionByName(
        spark.range(PLANTED).select(
            (F.col("id") + 1_000_000_000).alias("vec_id"),
            F.lit(99).cast("int").alias("label"),
            F.array(*[F.lit(0.5).cast("float")] * DIM).alias("embedding"),
        )
    )
    ps = profile_blocks(planted)
    print(
        f"planted profile: n_keys={ps.n_keys} max={ps.max_size} "
        f"p50={ps.p50} rec={ps.recommended_cap}"
    )
    t_sk, sk20 = timed_top20(lambda: embedding_cosine_pairs(planted), runs=2)
    n_sk = embedding_cosine_pairs(planted).count()
    print(
        f"planted uncapped: {t_sk:.2f}s  pairs={n_sk}  "
        f"top20 {sum(a == b for a, b in zip(sk20, ref20))}/20 vs natural"
    )
    t_cap, cap20 = timed_top20(
        lambda: embedding_cosine_pairs(planted, max_block=ps.recommended_cap)
    )
    n_cap = embedding_cosine_pairs(
        planted, max_block=ps.recommended_cap
    ).count()
    print(
        f"planted max_block={ps.recommended_cap}: {t_cap:.2f}s  pairs={n_cap}"
        f"  top20 {sum(a == b for a, b in zip(cap20, ref20))}/20 vs natural"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
