"""Batch scoring + error analytics (M10, ref assets/ml.py:631-760).

The PipelineModel guarantees serving-time schema alignment (the
reference hand-aligns pandas columns, ml.py:638-651 — MLlib pipelines
make that structural).  Error analytics are plain DataFrame aggregates.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def risk_level(col: Column) -> Column:
    """Threshold categorization (ref ml.py:687-694) — native when/otherwise.

    NULL in -> NULL out: every threshold comparison is NULL for a NULL
    input, so a bare ``otherwise`` would classify unlabeled rows as
    "Minimal" and feed ground-truth-less rows into risk accuracy (the
    error aggregates already skip them via NULL propagation)."""
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(col >= 20, "Critical")
        .when(col >= 10, "High")
        .when(col >= 5, "Medium")
        .when(col >= 1, "Low")
        .otherwise("Minimal")
    )


def score(
    model: PipelineModel,
    df: DataFrame,
    label_col: str,
    allow_incomplete_rows: bool = False,
) -> DataFrame:
    """Predict + per-row error columns (ref ml.py:653-665).

    The feature pipeline assembles with ``handleInvalid="skip"``, which
    silently DROPS any row carrying a NULL numeric feature — fine when
    fitting (incomplete rows can't train), but at scoring time a
    shrinking row set corrupts every downstream count and rate with no
    signal (r7 review).  The default therefore fails loudly when rows
    vanish; pass ``allow_incomplete_rows=True`` to accept the drop
    knowingly (the returned frame then covers only complete rows).
    """
    # cache before the guard count (r8 lens): the count executes the
    # full pipeline transform, and an uncached frame re-executed it for
    # every downstream aggregate — the default path paid the scoring
    # cost 3+ times
    pred = model.transform(df).cache()
    if not allow_incomplete_rows:
        n_in, n_out = df.count(), pred.count()
        if n_out < n_in:
            raise ValueError(
                f"scoring dropped {n_in - n_out} of {n_in} rows (NULL "
                "numeric features; the assembler skips them) — impute "
                "upstream or pass allow_incomplete_rows=True to accept "
                "a reduced population"
            )
    err = F.col("prediction") - F.col(label_col)
    # np.where guard (ml.py:660-661) — but NULL labels must stay NULL,
    # not 0.0: a ground-truth-less serving row scored as "0% error"
    # silently deflates any downstream MAPE
    safe_pct = (
        F.when(F.col(label_col).isNull(), F.lit(None).cast("double"))
        .when(F.col(label_col) > 0, F.abs(err) / F.col(label_col) * 100)
        .otherwise(0.0)
    )
    return (
        pred.withColumn("prediction_error", err)
        .withColumn("absolute_error", F.abs(err))
        .withColumn("percentage_error", safe_pct)
        .withColumn("predicted_risk", risk_level(F.col("prediction")))
        .withColumn("actual_risk", risk_level(F.col(label_col)))
    )


def error_analysis(scored: DataFrame, group_col: str | None = None) -> dict:
    """Error/bias/risk-accuracy summary (ref ml.py:655-733).

    Single aggregation pass; the optional per-group frame is a second
    small aggregate (ref ml.py:673-685).
    """
    # n = ALL rows, n_labeled = rows carrying ground truth: every
    # error metric below covers only labeled rows (the NULL-propagation
    # contract in score()), so rates must be read against n_labeled —
    # on a part-labeled serving frame the within/above buckets
    # partition n_labeled, NOT n (r8 lens)
    row = scored.agg(
        F.count("*").alias("n"),
        F.count("prediction_error").alias("n_labeled"),
        F.sqrt(F.avg(F.pow("prediction_error", 2))).alias("rmse"),
        F.avg("absolute_error").alias("mae"),
        F.avg("prediction_error").alias("bias"),
        F.avg((F.col("prediction_error") > 0).cast("double")).alias(
            "overestimation_rate"
        ),
        F.count(F.when(F.col("absolute_error") <= 1, 1)).alias("within_1"),
        F.count(F.when(F.col("absolute_error") <= 5, 1)).alias("within_5"),
        F.count(F.when(F.col("absolute_error") > 5, 1)).alias("above_5"),
        F.avg(
            (F.col("predicted_risk") == F.col("actual_risk")).cast("double")
        ).alias("risk_accuracy"),
    ).collect()[0]
    out = row.asDict()
    if group_col is not None:
        out["by_group"] = [
            r.asDict()
            for r in scored.groupBy(group_col)
            .agg(
                F.avg("absolute_error").alias("mae"),
                F.count("*").alias("n"),
                # avg_predicted restricted to LABELED rows so the
                # predicted-vs-actual comparison reads one population —
                # averaging predictions over unlabeled rows too would
                # conflate population mix with model bias (r7 review)
                F.avg(
                    F.when(
                        F.col("prediction_error").isNotNull(),
                        F.col("prediction"),
                    )
                ).alias("avg_predicted"),
                F.avg(F.col("prediction") - F.col("prediction_error")).alias(
                    "avg_actual"
                ),
            )
            # group_col tiebreak: equal-mae groups at the cutoff would
            # otherwise make the returned set partition-order-dependent
            .orderBy(F.desc("mae"), group_col)
            .limit(20)
            .collect()
        ]
    return out
