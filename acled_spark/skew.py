"""Skew mitigation: salting for hot keys + AQE configuration.

At 100 TB a handful of hot keys (the mega-user, the empty-string
category) dominate a shuffle partition and one task runs for hours.
Two mitigations, both exposed here:

- **AQE skew-join splitting** (:func:`enable_skew_handling`) — runtime
  re-planning splits oversized partitions; zero code changes, first
  line of defense.
- **Salting** — explicit two-phase shapes for when AQE can't help
  (aggregations with huge single groups, joins against a replicated
  small side): :func:`salted_aggregate` and :func:`salted_join`.
"""

from __future__ import annotations

from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


_SKEW_CONF_KEYS = (
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
)


def enable_skew_handling(
    spark: SparkSession,
    threshold_bytes: int | None = None,
    advisory_bytes: int | None = None,
) -> None:
    """Turn on (and optionally re-tune) AQE skew-join splitting.

    SESSION-GLOBAL and unscoped by design — call it once as deliberate
    session setup.  Every conf it touches applies to ALL subsequent
    queries on the session: a test-scale ``threshold_bytes`` (which
    also derives a tiny ``advisoryPartitionSizeInBytes``) would make
    every later query target byte-sized post-shuffle partitions, and
    it re-enables AQE on sessions where a user disabled it.  For a
    bounded tuning window (one skewed join, a test body), use
    :func:`skew_handling` — the set/restore context manager.
    """
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    if threshold_bytes is not None:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            str(threshold_bytes),
        )
        if advisory_bytes is None:
            advisory_bytes = max(threshold_bytes // 4, 1)
    if advisory_bytes is not None:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(advisory_bytes),
        )


@contextmanager
def skew_handling(
    spark: SparkSession,
    threshold_bytes: int | None = None,
    advisory_bytes: int | None = None,
):
    """Scoped :func:`enable_skew_handling`: snapshots the four AQE
    confs, applies the tuning for the ``with`` body, and restores the
    previous values (unsetting ones that were unset) on exit — so a
    test-scale threshold can never poison the shared session's later
    queries (r11 session-conf-drift review)."""
    before = {}
    for k in _SKEW_CONF_KEYS:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    enable_skew_handling(spark, threshold_bytes, advisory_bytes)
    try:
        yield spark
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


_MERGERS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``buckets`` tasks; phase 2 re-aggregates the per-salt partials by
    key (tiny input).

    ``aggs`` maps output name -> (phase-1 aggregate Column, merge op),
    where merge op is one of ``sum`` / ``min`` / ``max`` — the merge is
    EXPLICIT because only decomposable aggregates are salt-safe (count
    partials merge with ``sum``; an avg must be expressed as a
    count+sum pair and divided by the caller).
    """
    merge = []
    for name, (_, op) in aggs.items():
        if op not in _MERGERS:
            raise ValueError(
                f"agg {name!r}: merge op must be one of {sorted(_MERGERS)}, "
                f"got {op!r} (non-decomposable aggregates like avg cannot "
                "be salted directly — derive them from count+sum)"
            )
        merge.append(_MERGERS[op](name).alias(name))
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), buckets)
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[col.alias(name) for name, (col, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*merge)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join: salt the big side, replicate the small side.

    Each big-side row gets a random-ish salt in [0, buckets); the small
    side is exploded ``buckets``× so every (key, salt) pair exists.
    The shuffle then spreads a hot key over ``buckets`` tasks.  Use when
    the small side is too big to broadcast but small enough to
    replicate; otherwise prefer AQE skew-join.

    Only join types that never emit unmatched SMALL-side rows are
    accepted: with ``right``/``full`` the replicated side's unmatched
    rows would surface once per salt bucket (``buckets``× duplication).
    """
    normalized = how.lower().replace("_", "")
    if normalized not in {"inner", "left", "leftouter", "leftsemi", "semi",
                          "leftanti", "anti", "cross"}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the salt-and-replicate "
            "shape duplicates unmatched small-side rows under right/full "
            "joins; use AQE skew-join for those"
        )
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), buckets).cast(
            "int"
        ),
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_salted.join(small_replicated, [key, "__salt"], how)
    return out.drop("__salt")
