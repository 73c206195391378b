"""Scheduler/sensor loop: availability probing, missing-partition diff,
idempotent backfill (T1/T7) + model persistence round-trip (S9)."""

from __future__ import annotations

import os
from datetime import date

from acled_spark.scheduler import (
    materialized_partitions,
    missing_partitions,
    probe_available_days,
    run_backfill,
    sensor_tick,
)
from tests.test_acled_pipeline import make_fetcher


def _gapped_fetcher(missing_days: set[date], rows: int = 30):
    base = make_fetcher(rows_per_day=rows)

    def fetcher(day, page, limit, params):
        if day in missing_days:
            return []
        return base(day, page, limit, params)

    return fetcher


def test_probe_walkback_skips_unavailable_days():
    gap = {date(2025, 1, 9), date(2025, 1, 7)}
    fetcher = _gapped_fetcher(gap)
    got = probe_available_days(fetcher, date(2025, 1, 10), days_back=5)
    assert got == [date(2025, 1, 6), date(2025, 1, 8), date(2025, 1, 10)]


def test_backfill_materializes_only_missing(spark, tmp_path):
    bronze = os.path.join(str(tmp_path), "bronze")
    fetcher = _gapped_fetcher(set())
    days = [date(2025, 1, d) for d in (2, 3, 4)]

    done = run_backfill(spark, fetcher, bronze, days, limit=50)
    assert done == days
    assert materialized_partitions(bronze) == set(days)

    # second tick: nothing missing -> no work
    assert run_backfill(spark, fetcher, bronze, days, limit=50) == []
    # a new day appears -> only it is materialized
    new = date(2025, 1, 5)
    assert missing_partitions(bronze, days + [new]) == [new]
    assert run_backfill(spark, fetcher, bronze, days + [new], limit=50) == [new]
    assert spark.read.parquet(bronze).count() == 30 * 4


def test_sensor_tick_end_to_end(spark, tmp_path):
    bronze = os.path.join(str(tmp_path), "bronze")
    gap = {date(2025, 1, 8)}
    fetcher = _gapped_fetcher(gap)
    done = sensor_tick(
        spark, fetcher, bronze, today=date(2025, 1, 10), days_back=4, limit=50
    )
    # probed 4 days back, one unavailable -> three materialized
    assert done == [date(2025, 1, 7), date(2025, 1, 9), date(2025, 1, 10)]
    assert materialized_partitions(bronze) == set(done)


def test_model_save_load_roundtrip(spark, tmp_path):
    """S9: MLlib model persistence replaces the reference's pickle sink
    (ref io_manager.py:248-268)."""
    from acled_spark.ml import build_feature_pipeline
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.regression import GBTRegressor
    from pyspark.sql import functions as F

    from acled_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", F.hour("ts").cast("double").alias("hour"), "value"
    )
    pipe = build_feature_pipeline(["event_type"], [], ["hour"])
    model = Pipeline(
        stages=[pipe, GBTRegressor(labelCol="value", maxIter=5, seed=42)]
    ).fit(ev)
    before = model.transform(ev).agg(F.round(F.sum("prediction"), 4)).collect()[0][0]

    path = os.path.join(str(tmp_path), "model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    after = loaded.transform(ev).agg(F.round(F.sum("prediction"), 4)).collect()[0][0]
    assert before == after
