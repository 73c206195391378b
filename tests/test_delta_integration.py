"""Opt-in REAL Delta Lake MERGE integration test (VERDICT r6 #6).

The silver upsert's Delta branch (`acled_spark/silver.py:_upsert_delta`)
is call-sequence-tested against a fake DeltaTable in tests/test_silver.py
because this container cannot host the real library (evidence in
SCALE.md §"Delta MERGE evidence"): delta-spark is not importable, no
delta jars ship on Spark's classpath, and package installation is out
of policy for the environment.

In a deployment where delta-spark IS installed, this module runs one
real ``MERGE INTO`` round-trip end-to-end against the same
`upsert_partitioned` API the fakes exercise.  Opt in with::

    ACLED_DELTA_IT=1 python -m pytest tests/test_delta_integration.py

(env-gated on top of the import gate because the Delta session needs
its own SparkSession with the Delta SQL extension — created and torn
down here, outside the shared session fixture — and, for a pip-only
install, jar resolution via ``configure_spark_with_delta_pip`` that may
touch the network on first run).
"""

from __future__ import annotations

import os

import pytest

_OPT_IN = os.environ.get("ACLED_DELTA_IT") == "1"

pytestmark = pytest.mark.skipif(
    not _OPT_IN,
    reason="real-Delta integration is opt-in: set ACLED_DELTA_IT=1 "
    "(requires delta-spark + matching jars; see module docstring)",
)


@pytest.fixture(scope="module")
def delta_spark():
    delta = pytest.importorskip(
        "delta", reason="delta-spark not installed in this environment"
    )
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("acled-delta-it")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def test_real_delta_merge_round_trip(delta_spark, tmp_path):
    """Bootstrap -> correcting MERGE -> replay, all through the real
    Delta engine; asserts the same survivor contract the parquet path
    and the faked dispatch tests pin."""
    from pyspark.sql import functions as F

    from acled_spark.silver import upsert_partitioned
    from acled_spark.tables import load

    spark = delta_spark
    target = os.path.join(str(tmp_path), "silver_delta")
    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    d5 = ev.filter(F.col("day") == "2024-01-05").localCheckpoint()

    # bootstrap creates a REAL Delta table (transaction log present)
    upsert_partitioned(
        spark, d5, target, key="event_id", partition_col="day",
        table_format="delta",
    )
    assert os.path.isdir(os.path.join(target, "_delta_log"))
    base = spark.read.format("delta").load(target)
    n0 = base.count()
    assert n0 == d5.count()

    # corrected replay: MERGE must update in place, not append
    corrected = d5.withColumn("value", F.col("value") + 1000.0)
    upsert_partitioned(
        spark, corrected, target, key="event_id", partition_col="day",
        table_format="delta",
    )
    out = spark.read.format("delta").load(target)
    assert out.count() == n0  # same keys -> same cardinality
    shift = (
        out.agg(F.round(F.sum("value"), 2).alias("v")).collect()[0]["v"]
        - base.agg(F.round(F.sum("value"), 2).alias("v")).collect()[0]["v"]
    )
    assert abs(shift - 1000.0 * n0) < 1e-6

    # exact replay of the corrected batch is a no-op (idempotent MERGE)
    upsert_partitioned(
        spark, corrected, target, key="event_id", partition_col="day",
        table_format="delta",
    )
    again = spark.read.format("delta").load(target)
    assert again.count() == n0
    assert (
        again.agg(F.round(F.sum("value"), 2)).collect()[0][0]
        == out.agg(F.round(F.sum("value"), 2)).collect()[0][0]
    )
