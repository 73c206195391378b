"""SparkSession factory.

Defaults are chosen for the local test harness (``local[$SPARK_GRAFT_CPUS]``)
but every knob is the one you would set on a real cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  broadcast conversion) — at 100 TB the static plan is always wrong
  somewhere, AQE re-plans from real shuffle stats.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
  this should be ~2-3x total cores (AQE coalesces the excess).
- Arrow enabled for any pandas-UDF path (vectorized transfer).
- Session timezone pinned to UTC so date/timestamp semantics are
  deterministic and match the naive timestamps in the test parquet.
- ``nanosAsLong`` because the driver-generated parquet stores
  TIMESTAMP(NANOS) which Spark has no native type for.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime (non-static) confs that parity-critical code depends on.  These are
# also (re)applied by tables.configure() so queries behave identically when the
# harness hands us a session we didn't build.
#: confs CORRECTNESS depends on (UTC-pinned timestamps, nanos parquet
#: reads) — consumed by both get_spark and tables.configure so a
#: harness-supplied session and our own builder can never drift
PARITY_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

RUNTIME_CONF = {
    **PARITY_CONF,
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(
    app_name: str = "acled-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    When a session ALREADY exists in this process, it is returned
    untouched: ``getOrCreate`` would otherwise apply every modifiable
    builder conf to the foreign session — pinning a cluster user's
    ``shuffle.partitions`` to this harness's local sizing and flipping
    their session timezone — which is a local[32]-ism this library
    must never write into a session it didn't build.  The confs
    correctness actually depends on (``PARITY_CONF``) self-heal per
    read via :func:`acled_spark.tables.configure`.
    """
    existing = SparkSession.getActiveSession()
    if existing is not None:
        return existing
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
