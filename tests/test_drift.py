"""DriftMonitor lifecycle: reference init, per-batch PSI scoring,
shifted-distribution alarm, moving-baseline fold.

The PSI arithmetic itself is oracle-checked via the ``drift_psi``
registry query (test_parity); these tests pin the production face
around it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from acled_spark.drift import DriftMonitor, bin_counts, init_reference, psi_scores
from acled_spark.tables import load

# sf0.01, not the suite default sf0.001: PSI is a statistical measure,
# and ~100 events per (group, half) puts sampling noise at the 0.1-0.3
# level — the "same distribution" assertion needs ~1000 per group
SF_DIR = "/root/testdata/sf0.01"


def _halves(spark):
    ev = load(spark, SF_DIR, "events")
    return ev.filter(F.col("event_id") % 2 == 0), ev.filter(
        F.col("event_id") % 2 == 1
    )


def test_same_distribution_scores_stable(spark, tmp_path):
    ref, batch = _halves(spark)
    root = str(tmp_path / "ref")
    init_reference(ref, root)
    mon_scores = []
    mon = DriftMonitor(root, on_scores=lambda s: mon_scores.append(s.collect()))
    mon(batch, epoch_id=0)
    assert mon.batches_scored == 1
    rows = {r["group"]: r for r in mon_scores[0]}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    assert all(not r["drifted"] for r in rows.values())
    assert all(r["psi"] < 0.05 for r in rows.values())


def test_shifted_distribution_raises_alarm(spark, tmp_path):
    ref, batch = _halves(spark)
    root = str(tmp_path / "ref")
    init_reference(ref, root)
    shifted = batch.withColumn("value", F.col("value") + 200.0)
    scores = {
        r["group"]: r
        for r in psi_scores(bin_counts(ref), bin_counts(shifted)).collect()
    }
    assert all(r["drifted"] for r in scores.values())
    assert all(r["psi"] > 0.25 for r in scores.values())


def test_group_only_in_batch_scores_maximally(spark, tmp_path):
    ref, batch = _halves(spark)
    novel = batch.withColumn("event_type", F.lit("brand-new-type"))
    scores = {
        r["group"]: r
        for r in psi_scores(bin_counts(ref), bin_counts(novel)).collect()
    }
    # reference groups with an empty batch side AND the unseen batch
    # group must all still produce rows (grid over the group union)
    assert "brand-new-type" in scores
    assert scores["brand-new-type"]["n_old"] == 0
    assert scores["brand-new-type"]["drifted"]


def test_moving_baseline_folds_batch_counts(spark, tmp_path):
    ref, batch = _halves(spark)
    root = str(tmp_path / "ref")
    init_reference(ref, root)
    n_ref = ref.count()
    mon = DriftMonitor(root, update_reference=True)
    mon(batch, epoch_id=0)
    folded = spark.read.parquet(root)
    assert folded.agg(F.sum("n")).collect()[0][0] == n_ref + batch.count()
    # a replay of the same batch against the GROWN reference still scores
    mon(batch, epoch_id=1)
    assert mon.batches_scored == 2
