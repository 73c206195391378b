"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multiway-join query on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (see
acled_spark/queries/*; names map to the §2 inventory ids).
``oracle_sql()`` — matching DuckDB SQL for the hash-parity gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from acled_spark.registry import oracle_map, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from acled_spark.queries.joins import j5_multiway_revenue

    return j5_multiway_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each oracle-expressible query."""
    return oracle_map()
