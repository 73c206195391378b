"""Ingestion scheduling: availability probing, missing-partition diff,
backfill loop (SURVEY §2.10 T1/T7, §2.1 S11-S13).

The reference's Dagster sensors poll the API (limit-1 probe per candidate
day, 10-day walk-back), diff against materialized partitions, and emit a
run per missing day (``sensors.py:14-159``).  Here that's a plain driver
loop — state lives in the bronze store itself (partition directories are
the materialization record; no sensor cursor to corrupt).
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence
from datetime import date, timedelta

from pyspark.sql import SparkSession

from acled_spark.bronze import typed_cast, write_bronze
from acled_spark.schema import PARTITION_COL
from acled_spark.source import PageFetcher, ingest_day

_PART_RE = re.compile(r"^event_date=(\d{4}-\d{2}-\d{2})$")


def materialized_partitions(bronze_path: str) -> set[date]:
    """Partition discovery from the store layout (ref sensors.py:196-224 —
    the S3 listing parse becomes a partition-dir listing)."""
    if not os.path.isdir(bronze_path):
        return set()
    out = set()
    for entry in os.listdir(bronze_path):
        m = _PART_RE.match(entry)
        if m:
            out.add(date.fromisoformat(m.group(1)))
    return out


def probe_available_days(
    fetcher: PageFetcher, end_day: date, days_back: int = 10
) -> list[date]:
    """API availability probe: limit-1 query per candidate day, walking
    back N days (ref sensors.py:26-82)."""
    available = []
    for i in range(days_back):
        day = end_day - timedelta(days=i)
        if fetcher(day, 1, 1, {}):
            available.append(day)
    return sorted(available)


def missing_partitions(
    bronze_path: str, candidates: Sequence[date]
) -> list[date]:
    """Diff candidates against materialized partitions (ref sensors.py:85-131)."""
    done = materialized_partitions(bronze_path)
    return sorted(d for d in candidates if d not in done)


def run_backfill(
    spark: SparkSession,
    fetcher: PageFetcher,
    bronze_path: str,
    candidates: Sequence[date],
    limit: int = 5000,
) -> list[date]:
    """Materialize every missing candidate day (ref jobs.py:8-12 backfill).

    Each day is one ingest->cast->partition-overwrite cycle; re-running
    is safe (dynamic overwrite replaces only that day's directory).
    Returns the days actually materialized.
    """
    todo = missing_partitions(bronze_path, candidates)
    for day in todo:
        raw = ingest_day(spark, fetcher, day, limit=limit)
        typed = typed_cast(raw)
        write_bronze(typed, bronze_path, mode="overwrite")
    return todo


def sensor_tick(
    spark: SparkSession,
    fetcher: PageFetcher,
    bronze_path: str,
    today: date,
    days_back: int = 10,
    limit: int = 5000,
) -> list[date]:
    """One scheduled sensor evaluation: probe -> diff -> ingest missing
    (the 172800s-interval acled_sensor body, ref sensors.py:14-159)."""
    available = probe_available_days(fetcher, today, days_back)
    return run_backfill(spark, fetcher, bronze_path, available, limit=limit)
