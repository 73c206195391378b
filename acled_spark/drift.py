"""Distribution-drift monitoring: PSI against a persisted reference.

The batch face lives in the registry (``drift_psi`` — oracle-checked);
this module is the PRODUCTION shape around the same arithmetic:

- :func:`bin_counts` reduces a frame to its ``(group, bin, n)`` sketch —
  the only thing drift monitoring ever needs to persist (|groups|·bins
  rows, regardless of corpus size);
- :func:`psi_scores` computes per-group PSI between two such sketches —
  pure arithmetic on tiny frames, no rescan of either period;
- :class:`DriftMonitor` is the ``foreachBatch`` face (the drift analog
  of :class:`acled_spark.dedup_store.DedupMaintainer` and
  :class:`acled_spark.ann.IvfMaintainer`): each micro-batch is scored
  against the persisted reference counts, scores go to a policy hook
  (alert, log, trigger retrain), and the reference can optionally
  absorb the batch so the monitor tracks a moving baseline.

Scale: a batch is scanned once into its bin sketch; the reference
parquet is |groups|·bins rows.  Nothing else moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BINS = 10
DEFAULT_WIDTH = 50.0
#: conventional PSI reading: <0.1 stable, 0.1–0.25 moderate, >0.25 act
PSI_ALERT = 0.1


def bin_counts(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = DEFAULT_BINS,
    width: float = DEFAULT_WIDTH,
) -> DataFrame:
    """``(group, bin, n)`` sketch of a frame's value distribution.

    Fixed-width bins with edge clamping; NULL values clamp into bin 0
    (GREATEST/LEAST propagate the 0 floor over NULL), matching the
    ``drift_psi`` oracle's CASE semantics.
    """
    return (
        df.select(
            F.col(group_col).alias("group"),
            F.least(
                F.lit(n_bins - 1),
                F.greatest(F.lit(0), F.floor(F.col(value_col) / width).cast("int")),
            ).alias("bin"),
        )
        .groupBy("group", "bin")
        .agg(F.count("*").alias("n"))
    )


def psi_scores(old_counts: DataFrame, new_counts: DataFrame, n_bins: int = DEFAULT_BINS) -> DataFrame:
    """Per-group PSI between two ``bin_counts`` sketches.

    PSI = Σ_bins (p_new - p_old)·ln(p_new/p_old) with Laplace smoothing
    ((n_b + 0.5)/(n_t + bins/2)), every bin of every group present
    (grid completion over the UNION of groups — a group seen in only
    one sketch still scores, maximally drifted).  Output:
    ``(group, n_old, n_new, psi, drifted)``.
    """
    merged = (
        old_counts.select("group", "bin", F.col("n").alias("n_old_b"))
        .join(
            new_counts.select("group", "bin", F.col("n").alias("n_new_b")),
            ["group", "bin"],
            "full_outer",
        )
        .fillna(0, subset=["n_old_b", "n_new_b"])
        # tiny (|groups|·bins); materialized so grid completion derives
        # the group domain without re-running either input's lineage
        .localCheckpoint()
    )
    return psi_from_merged(merged, n_bins)


def psi_from_merged(merged: DataFrame, n_bins: int = DEFAULT_BINS) -> DataFrame:
    """PSI from an already-materialized ``(group, bin, n_old_b,
    n_new_b)`` frame — the arithmetic core shared by :func:`psi_scores`
    and the oracle-checked ``drift_psi`` registry query (which derives
    the merged frame in a single corpus scan)."""
    grid = merged.select("group").distinct().select(
        "group", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    )
    filled = grid.join(merged, ["group", "bin"], "left").fillna(
        0, subset=["n_old_b", "n_new_b"]
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("group")
    smooth = float(n_bins) / 2.0
    probs = filled.select(
        "group",
        "n_new_b",
        "n_old_b",
        F.sum("n_old_b").over(w).cast("long").alias("n_old_t"),
        F.sum("n_new_b").over(w).cast("long").alias("n_new_t"),
    )
    p_new = (F.col("n_new_b") + 0.5) / (F.col("n_new_t") + smooth)
    p_old = (F.col("n_old_b") + 0.5) / (F.col("n_old_t") + smooth)
    psi = F.round(F.sum((p_new - p_old) * F.log(p_new / p_old)), 4)
    return (
        probs.groupBy("group")
        .agg(
            F.max("n_old_t").alias("n_old"),
            F.max("n_new_t").alias("n_new"),
            psi.alias("psi"),
            (psi >= PSI_ALERT).alias("drifted"),
        )
        .orderBy("group")
    )


def init_reference(
    df: DataFrame,
    root: str,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = DEFAULT_BINS,
    width: float = DEFAULT_WIDTH,
) -> None:
    """Materialize the reference sketch for a baseline corpus/period."""
    bin_counts(df, value_col, group_col, n_bins, width).write.mode(
        "overwrite"
    ).parquet(root)


class DriftMonitor:
    """``foreachBatch`` face: score each micro-batch's distribution
    against the persisted reference sketch::

        mon = DriftMonitor(root, on_scores=alert_fn)
        stream.writeStream.foreachBatch(mon).start()

    ``on_scores`` receives the per-group PSI frame each batch (route to
    alerting, metrics, a retrain trigger — the pipeline's policy, not
    the monitor's).  With ``update_reference=True`` the batch's counts
    fold into the reference after scoring, so the baseline tracks the
    stream (drift then means "new batch vs everything seen", the
    moving-baseline policy); default keeps the reference frozen (drift
    means "vs the blessed baseline", the release-gate policy).
    """

    def __init__(
        self,
        root: str,
        value_col: str = "value",
        group_col: str = "event_type",
        n_bins: int = DEFAULT_BINS,
        width: float = DEFAULT_WIDTH,
        on_scores=None,
        update_reference: bool = False,
    ):
        self.root = root
        self.value_col = value_col
        self.group_col = group_col
        self.n_bins = n_bins
        self.width = width
        self.on_scores = on_scores
        self.update_reference = update_reference
        self.batches_scored = 0

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new = bin_counts(
            batch_df, self.value_col, self.group_col, self.n_bins, self.width
        ).localCheckpoint()  # one batch scan, shared by score + fold
        old = spark.read.parquet(self.root)
        scores = psi_scores(old, new, self.n_bins).localCheckpoint()
        if self.on_scores is not None:
            self.on_scores(scores)
        if self.update_reference:
            merged = (
                old.unionByName(new)
                .groupBy("group", "bin")
                .agg(F.sum("n").alias("n"))
                # sever the reference-read lineage before overwriting it
                .localCheckpoint()
            )
            merged.write.mode("overwrite").parquet(self.root)
        self.batches_scored += 1
