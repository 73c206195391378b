"""SQL-expressible ML feature-engineering operators (SURVEY.md §2.9).

The oracle-checkable subset of the ML surface: out-of-fold target
encoding (M1), one-hot via pivot (M2), label encoding (M3), geo-style
distance-from-center (M4).  The full MLlib training pipeline (M6-M10)
lives in acled_spark.ml with its own tests (not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acled_spark.registry import query
from acled_spark.tables import load

SMOOTHING = 10  # ref ml.py:47-70 (smoothing=10)
N_FOLDS = 5     # ref ml.py cv=5


# --- M1: K-fold CV target encoding with smoothing ---------------------------
# Ref: assets/ml.py:47-70 — out-of-fold smoothed mean per category:
#   (count*mean + m*global_mean) / (count + m), unseen -> global mean.
# Folds are deterministic (c_custkey % 5) so both engines agree — the
# reference uses sklearn KFold(seed=42); parity is defined as "same
# formula, same fold protocol", per SURVEY §7.4.
@query(
    "ml_target_encode_cv",
    oracle=f"""
    WITH base AS (
      SELECT c.c_custkey, c.c_mktsegment,
             c.c_custkey % {N_FOLDS} AS fold,
             o.o_totalprice
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    fold_stats AS (
      SELECT c_mktsegment, fold, COUNT(o_totalprice) AS cnt,
             SUM(o_totalprice) AS s
      FROM base GROUP BY c_mktsegment, fold
    ),
    seg_tot AS (
      SELECT c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS tot_cnt, SUM(s) AS tot_s
      FROM fold_stats GROUP BY c_mktsegment
    ),
    fold_tot AS (
      SELECT fold, CAST(SUM(cnt) AS BIGINT) AS f_cnt, SUM(s) AS f_s
      FROM fold_stats GROUP BY fold
    ),
    g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS g_cnt, SUM(s) AS g_s FROM fold_stats),
    encoded AS (
      SELECT b.c_custkey, b.c_mktsegment, b.fold,
             (t.tot_cnt - COALESCE(f.cnt, 0)) AS oof_cnt,
             (t.tot_s - COALESCE(f.s, 0)) AS oof_s,
             (g.g_cnt - ft.f_cnt) AS oof_gcnt,
             (g.g_s - ft.f_s) AS oof_gs
      FROM (SELECT DISTINCT c_custkey, c_mktsegment, fold FROM base) b
      JOIN seg_tot t ON b.c_mktsegment = t.c_mktsegment
      LEFT JOIN fold_stats f ON b.c_mktsegment = f.c_mktsegment AND b.fold = f.fold
      JOIN fold_tot ft ON b.fold = ft.fold
      CROSS JOIN g
    )
    SELECT c_custkey, c_mktsegment, CAST(fold AS INTEGER) AS fold,
           ROUND(CASE WHEN oof_cnt > 0
                 THEN (oof_s + {SMOOTHING} * (oof_gs / NULLIF(oof_gcnt, 0))) / (oof_cnt + {SMOOTHING})
                 ELSE oof_gs / NULLIF(oof_gcnt, 0) END, 4) AS target_encoded
    FROM encoded ORDER BY c_custkey
    """,
    tags=("ml", "join"),
)
def ml_target_encode_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold smoothed target encoding, deterministic folds (ref ml.py:47-70).

    Plan shape: the orders⋈customer join executes ONCE, feeding the
    (category × fold) partial stats; the global totals are a rollup of
    fold_stats (not a second pass over the fact), and the output row
    set comes from customer semi-joined against the pruned
    distinct-o_custkey scan — no second fact JOIN anywhere.

    Out-of-fold semantics (r7 review, mirrored in the oracle AND in
    ml/features.out_of_fold_target_encode): the category stats subtract
    the row's own (category, fold) cell, and the smoothing PRIOR
    subtracts the row's ENTIRE fold — subtracting only the cell left
    other categories' same-fold targets inside the prior, leaking
    validation-fold values into every encoded training feature.
    Counts use count(target): a NULL-target row contributes to neither
    sum nor count (the serving encoder's convention).
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_custkey") % N_FOLDS).alias("fold"),
            "o_totalprice",
        )
    )
    # materialized: FOUR consumers (seg_tot, fold_tot, g, the per-row
    # join) — with three, Spark's exchange reuse deduplicated the fact
    # join, but the r7 fold_tot addition broke the reuse and every
    # consumer re-scanned orders⋈customer (caught by the registry-wide
    # plan-hygiene gate); the frame is |cat|·|folds| rows, same
    # discipline as features.out_of_fold_target_encode
    fold_stats = base.groupBy("c_mktsegment", "fold").agg(
        F.count("o_totalprice").alias("cnt"), F.sum("o_totalprice").alias("s")
    ).localCheckpoint(eager=False)  # lazy (r8 lens): eager ran the fact
    # join at BUILD time, so explain()/plan-gates executed a cluster job
    seg_tot = fold_stats.groupBy("c_mktsegment").agg(
        F.sum("cnt").cast("long").alias("tot_cnt"), F.sum("s").alias("tot_s")
    )
    fold_tot = fold_stats.groupBy("fold").agg(
        F.sum("cnt").cast("long").alias("f_cnt"), F.sum("s").alias("f_s")
    )
    g = fold_stats.agg(
        F.sum("cnt").cast("long").alias("g_cnt"), F.sum("s").alias("g_s")
    )
    rows = cust.select(
        "c_custkey", "c_mktsegment", (F.col("c_custkey") % N_FOLDS).alias("fold")
    ).join(
        orders.select("o_custkey").distinct(),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    )
    enc = (
        rows.join(F.broadcast(seg_tot), "c_mktsegment")
        .join(F.broadcast(fold_stats), ["c_mktsegment", "fold"], "left")
        .join(F.broadcast(fold_tot), "fold")
        .crossJoin(F.broadcast(g))
        .select(
            "c_custkey",
            "c_mktsegment",
            "fold",
            (F.col("tot_cnt") - F.coalesce(F.col("cnt"), F.lit(0))).alias("oof_cnt"),
            (F.col("tot_s") - F.coalesce(F.col("s"), F.lit(0.0))).alias("oof_s"),
            (F.col("g_cnt") - F.col("f_cnt")).alias("oof_gcnt"),
            (F.col("g_s") - F.col("f_s")).alias("oof_gs"),
        )
    )
    oof_gmean = F.when(
        F.col("oof_gcnt") > 0, F.col("oof_gs") / F.col("oof_gcnt")
    )
    smoothed = (F.col("oof_s") + SMOOTHING * oof_gmean) / (
        F.col("oof_cnt") + SMOOTHING
    )
    return enc.select(
        "c_custkey",
        "c_mktsegment",
        F.col("fold").cast("int").alias("fold"),
        F.round(
            F.when(F.col("oof_cnt") > 0, smoothed).otherwise(oof_gmean), 4
        ).alias("target_encoded"),
    ).orderBy("c_custkey")


# --- M2: one-hot encoding via pivot -----------------------------------------
# Ref: assets/ml.py:80-82 (pd.get_dummies on low-cardinality categoricals).
_STATUSES = ["F", "O", "P"]


@query(
    "ml_onehot_pivot",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           {", ".join(f"COUNT(CASE WHEN o_orderstatus = '{s}' THEN 1 END) AS status_{s}" for s in _STATUSES)}
    FROM orders GROUP BY month ORDER BY month
    """,
    tags=("ml", "agg"),
)
def ml_onehot_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot expansion of a categorical via pivot (ref ml.py:80-82).

    Explicit pivot values (the known domain) keep this a single pass —
    without them Spark needs an extra distinct-values job.
    """
    o = load(spark, sf_dir, "orders")
    out = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
        )
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    for s in _STATUSES:
        out = out.withColumnRenamed(s, f"status_{s}")
    # pivot leaves null where a (month, status) pair had no rows; the
    # CASE-count oracle yields 0 — align semantics.
    out = out.fillna(0, subset=[f"status_{s}" for s in _STATUSES])
    return out.orderBy("month")


# --- M3: label encoding (stable ordinal ids) --------------------------------
# Ref: assets/ml.py:128-139 (LabelEncoder; unseen -> -1 at serving).
# sklearn assigns ids by sorted class name — reproduced exactly with a
# dense_rank over the alphabetical order, minus 1 for 0-based ids.
@query(
    "ml_label_encode",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT) AS label_id
      FROM (SELECT DISTINCT c_mktsegment FROM customer
            WHERE c_mktsegment IS NOT NULL)
    )
    SELECT c.c_custkey, c.c_mktsegment, m.label_id
    FROM customer c JOIN m ON c.c_mktsegment = m.c_mktsegment
    ORDER BY c.c_custkey
    """,
    tags=("ml",),
)
def ml_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sklearn-LabelEncoder-compatible ordinal ids (ref ml.py:128-139).

    The id table is tiny (distinct categories) → broadcast join back.
    Serving-time unseen categories map to -1 (see acled_spark.ml tests).
    """
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_mktsegment")
    mapping = (
        c.select("c_mktsegment")
        # NULL is not a class (sklearn raises on NULLs; label_encode_fit
        # excludes None) — and the engines DISAGREE on its rank: Spark
        # sorts NULL first (shifting every real label up by 1), DuckDB
        # last.  Filter before ranking, on BOTH engines (r7 review);
        # the final inner join drops NULL rows from the output either
        # way, so the domain is identical.
        .filter(F.col("c_mktsegment").isNotNull())
        .distinct()
        .select(
            "c_mktsegment",
            (F.dense_rank().over(w) - 1).cast("long").alias("label_id"),
        )
    )
    return (
        c.join(F.broadcast(mapping), "c_mktsegment")
        .select("c_custkey", "c_mktsegment", "label_id")
        .orderBy("c_custkey")
    )


# --- M4: distance-from-center feature ---------------------------------------
# Ref: assets/ml.py:142-153 — euclidean distance from the (median, median)
# center of two numeric columns; medians are exact (pandas parity).
@query(
    "ml_distance_from_center",
    oracle="""
    WITH c AS (
      SELECT CAST(quantile_cont(p_size, 0.5) AS DOUBLE) AS med_size,
             CAST(quantile_cont(p_retailprice, 0.5) AS DOUBLE) AS med_price
      FROM part
    )
    SELECT p_partkey,
           ROUND(SQRT(POW(p_size - c.med_size, 2) + POW(p_retailprice - c.med_price, 2)), 4)
             AS distance_from_center
    FROM part CROSS JOIN c
    ORDER BY p_partkey LIMIT 100
    """,
    tags=("ml", "scalar"),
)
def ml_distance_from_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean distance from median center (ref ml.py:142-153).

    The 1-row center aggregate broadcasts; the feature map is narrow.
    """
    p = load(spark, sf_dir, "part")
    center = p.agg(
        F.percentile("p_size", 0.5).alias("med_size"),
        F.percentile("p_retailprice", 0.5).alias("med_price"),
    )
    dist = F.sqrt(
        F.pow(F.col("p_size") - F.col("med_size"), 2)
        + F.pow(F.col("p_retailprice") - F.col("med_price"), 2)
    )
    return (
        p.crossJoin(F.broadcast(center))
        .select("p_partkey", F.round(dist, 4).alias("distance_from_center"))
        .orderBy("p_partkey")
        .limit(100)
    )
