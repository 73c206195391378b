"""Bucketed co-located joins: the 100 TB strategy for fact-fact joins
(SURVEY §2.3 scale note — bucket orders and lineitem on the orderkey and
the join needs NO shuffle)."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from acled_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    load(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("orders_b")
    load(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("lineitem_b")
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    from tests.conftest import formatted_plan

    orders_b, lineitem_b = bucketed_tables
    joined = spark.table(orders_b).join(
        spark.table(lineitem_b),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = formatted_plan(spark, joined, disable_broadcast=True)
    assert "Exchange" not in plan, plan[:1500]
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_correct(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    bucketed = (
        spark.table(orders_b)
        .join(
            spark.table(lineitem_b),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("rev"),
        )
        .collect()[0]
    )
    plain = (
        load(spark, SF_DIR, "orders")
        .join(
            load(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("rev"),
        )
        .collect()[0]
    )
    assert tuple(bucketed) == tuple(plain)
