"""Raw SQL API surface: the engine accepts ANSI SQL directly via
``spark.sql`` over registered views — Catalyst parses/optimizes it into
the same physical plans as the DataFrame builders (SURVEY §0: Spark
itself provides the parse/optimize/execute machinery the reference
delegated to Postgres)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from acled_spark.registry import query
from acled_spark.tables import load

_SQL = """
SELECT r.r_name AS region_name,
       n.n_name AS nation_name,
       COUNT(DISTINCT c.c_custkey) AS customers,
       COUNT(o.o_orderkey) AS orders,
       ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS revenue
FROM {customer} c
JOIN {nation} n ON c.c_nationkey = n.n_nationkey
JOIN {region} r ON n.n_regionkey = r.r_regionkey
LEFT JOIN {orders} o ON o.o_custkey = c.c_custkey
GROUP BY region_name, nation_name
ORDER BY region_name, nation_name
"""


@query(
    "sql1_region_revenue",
    oracle=_SQL.format(
        customer="customer", nation="nation", region="region", orders="orders"
    ),
    tags=("sql", "join", "agg"),
)
def sql1_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME SQL text runs on Spark and the oracle — parser-level parity.

    Views are registered with a suffix derived from sf_dir so plans built
    against different scale factors in one session never share (or
    clobber) each other's views; DuckDB gets the bare table names the
    harness pre-registers.
    """
    import re

    suffix = "_sqlapi_" + re.sub(r"[^0-9A-Za-z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    for name in ("customer", "nation", "region", "orders"):
        load(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
    return spark.sql(
        _SQL.format(
            customer="customer" + suffix,
            nation="nation" + suffix,
            region="region" + suffix,
            orders="orders" + suffix,
        )
    )
