"""Partition pruning: date predicates on event_date-partitioned storage
must prune at plan time (SURVEY §4 — the reference got this from its
S3-key-per-day layout; we get it from hive partitioning)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from acled_spark.tables import load
from tests.conftest import formatted_plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = os.path.join(str(tmp_path_factory.mktemp("part")), "events_by_day")
    ev = load(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    ev.write.partitionBy("day").parquet(path)
    return path


def test_day_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("day") == "2024-01-05"
    )
    plan = formatted_plan(spark, df)
    assert "PartitionFilters" in plan
    # the equality predicate must appear as a partition filter, not a
    # post-scan data filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "2024-01-05" in pf_line or "day" in pf_line
    # and only one partition's rows are read
    one_day = df.count()
    total = spark.read.parquet(partitioned_events).count()
    assert 0 < one_day < total


def test_range_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("day").between("2024-01-10", "2024-01-12")
    )
    got_days = {r[0] for r in df.select("day").distinct().collect()}
    assert len(got_days) == 3
    # plan evidence: both range bounds land in PartitionFilters
    # (NB: df.inputFiles() reports the UNFILTERED relation — useless here)
    pf_line = next(
        l
        for l in formatted_plan(spark, df).splitlines()
        if "PartitionFilters" in l
    )
    assert "2024-01-10" in pf_line and "2024-01-12" in pf_line
