"""Testdata table loaders with engine-parity normalization.

The driver materializes a deterministic star schema + stream/LLM tables
(``TESTDATA.md``) at ``/root/testdata/sf*/``.  Loading rules:

- ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as a long
  (``spark.sql.legacy.parquet.nanosAsLong``).  We convert with exact
  integer division to micros -> TIMESTAMP_NTZ so values match DuckDB's
  naive timestamps bit-for-bit regardless of session timezone.
- ``orders.o_orderdate`` / ``lineitem.l_shipdate`` already arrive as
  TIMESTAMP_NTZ (micros) — no conversion needed.

Everything downstream (queries, benchmarks, tests) goes through
``load`` so the normalization lives in exactly one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# CLI default data dir; SPARK_GRAFT_SF_DIR overrides (same env knob the
# bench harness honors).  __main__'s argparse defaults read THIS — a
# literal default in the CLI had already drifted from this constant.
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def configure(spark: SparkSession) -> None:
    """Apply runtime confs parity depends on (idempotent, cheap).

    The correctness harness hands us ITS session; we cannot assume it was
    built by :func:`acled_spark.session.get_spark`.  A set that fails is
    tolerated ONLY if the conf already holds the required value (static
    conf pre-set by the builder) — silently proceeding on a wrong
    timezone would shift every events.ts with no error.
    """
    from acled_spark.session import PARITY_CONF

    for k, v in PARITY_CONF.items():
        if k == "spark.sql.session.timeZone":
            # the UTC pin is load-bearing (events.ts parity, window
            # bucketing) but it is a SESSION-WIDE mutation of a session
            # we may not own — surface it the one time it actually
            # changes something, so a user whose session was
            # deliberately non-UTC learns their other queries' rendering
            # shifted (r11 session-conf-drift review)
            prev = spark.conf.get(k, None)
            if prev is not None and prev.lower() != v.lower():
                import warnings

                warnings.warn(
                    f"acled_spark pinned {k}={v} on this session (was "
                    f"{prev}): engine/oracle timestamp parity requires "
                    "UTC; unrelated queries on this session now render "
                    "timestamps in UTC too",
                    stacklevel=3,
                )
        try:
            spark.conf.set(k, v)
        except Exception:
            if str(spark.conf.get(k, None)).lower() != v.lower():
                raise


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalized for engine parity."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos (long) -> micros (exact integral division) -> naive timestamp
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS timestamp_ntz)")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register all tables as temp views (for spark.sql entry points)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
