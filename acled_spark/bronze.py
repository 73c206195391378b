"""Bronze layer: raw (all-string) records -> typed, partitioned parquet.

Re-expresses the reference's ingest cast list (``base_assets.py:120-141``)
and bronze writer (``io_manager.py:29-79``):

- null-on-error casts (Polars ``strict=False`` ≙ Spark ``try_cast``);
- ``event_timestamp`` derived from epoch seconds × 1000 -> ms timestamp;
- storage partitioned by ``event_date`` (the reference's one-object-per-
  day S3 layout becomes hive partition dirs → partition pruning for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acled_spark.schema import ACLED_SCHEMA, PARTITION_COL


def typed_cast(raw: DataFrame) -> DataFrame:
    """Coerce a raw all-string frame to the typed ACLED schema.

    Malformed values become NULL (``try_cast``), matching the
    reference's ``strict=False`` Polars casts (``io_manager.py:41-53``).
    The raw epoch-seconds ``timestamp`` column derives
    ``event_timestamp`` (``base_assets.py:132-140``:
    ``when(ts.is_not_null()).then(cast(Int64) * 1000 -> Datetime(ms))``).
    """
    cols = []
    for field in ACLED_SCHEMA.fields:
        name, dtype = field.name, field.dataType.simpleString()
        if name == "event_timestamp":
            # try_cast and timestamp_seconds both propagate NULL, so no
            # explicit when/otherwise guard is needed
            cols.append(
                F.timestamp_seconds(
                    F.expr("try_cast(timestamp AS bigint)")
                ).alias(name)
            )
        elif name == "event_date":
            cols.append(F.expr("try_cast(event_date AS date)").alias(name))
        elif dtype == "string":
            cols.append(F.col(name).cast("string").alias(name))
        else:
            cols.append(F.expr(f"try_cast({name} AS {dtype})").alias(name))
    return raw.select(*cols)


def write_bronze(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Typed frame -> parquet partitioned by event_date (``io_manager.py:55-79``).

    Dynamic partition overwrite: re-materializing one day replaces only
    that day's directory (the reference's per-partition S3 object
    semantics).
    """
    from acled_spark.silver import dynamic_writer

    dynamic_writer(df).mode(mode).partitionBy(PARTITION_COL).parquet(path)


def read_bronze(spark, path: str) -> DataFrame:
    return spark.read.schema(ACLED_SCHEMA).parquet(path)
