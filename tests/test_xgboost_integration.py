"""Opt-in REAL SparkXGBRegressor integration test (VERDICT r7 #2).

SURVEY M7 maps the reference's XGBRegressor + RandomizedSearchCV (ref
ml.py:390-420) onto GBTRegressor + seeded random-search CrossValidator
because this container cannot host xgboost — evidence recorded in
SCALE.md §"XGBoost evidence" (mirroring the Delta pattern):
``importlib.util.find_spec("xgboost")`` is None, ``pip list`` has no
xgboost package, and installing packages is out of policy here.  The
estimator seam is nonetheless REAL: ``make_estimator("xgboost")``
returns ``xgboost.spark.SparkXGBRegressor`` with the 7-knob search
space translated name-for-name (XGB_PARAM_NAMES), so deployments with
the library swap estimators without touching the train API.

In a deployment where xgboost>=1.7 IS installed, this module runs one
real fit/predict round-trip through the same ``train_regressor`` API
the GBT tests exercise.  Opt in with::

    ACLED_XGB_IT=1 python -m pytest tests/test_xgboost_integration.py

(env-gated on top of the import gate because SparkXGBRegressor spins
Python barrier tasks per partition — a deliberate, heavier execution
mode than the shared session fixture's default workload.)
"""

from __future__ import annotations

import os

import pytest

_OPT_IN = os.environ.get("ACLED_XGB_IT") == "1"

pytestmark = pytest.mark.skipif(
    not _OPT_IN,
    reason="real-xgboost integration is opt-in: set ACLED_XGB_IT=1 "
    "(requires xgboost>=1.7 with xgboost.spark; see module docstring)",
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def training_frame(spark):
    pytest.importorskip(
        "xgboost.spark", reason="xgboost.spark not installed here"
    )
    from pyspark.sql import functions as F

    from acled_spark.tables import load

    ev = load(spark, SF_DIR, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.col("user_id").cast("string").alias("user_cat"),
        F.hour("ts").cast("double").alias("hour"),
        F.dayofweek("ts").cast("double").alias("dow"),
        "value",
    )


def test_real_xgboost_fit_predict_round_trip(spark, training_frame):
    """One SparkXGBRegressor fit/predict through train_regressor — the
    same API, search space, folds, and seed as the GBT path; asserts
    the model scores, the metrics populate, and the best_params carry
    the canonical (GBT-named) knobs the seeded search drew."""
    from acled_spark.ml import build_feature_pipeline
    from acled_spark.ml.train import SEARCH_SPACE, train_regressor

    pipeline = build_feature_pipeline(
        onehot_cols=["event_type"],
        label_cols=["user_cat"],
        numeric_cols=["hour", "dow"],
    )
    trained = train_regressor(
        training_frame,
        pipeline,
        label_col="value",
        n_candidates=2,
        n_folds=2,
        parallelism=1,
        estimator="xgboost",
    )
    assert trained.metrics["train"]["rmse"] > 0
    assert trained.metrics["test"]["rmse"] > 0
    assert trained.best_params.keys() == set(SEARCH_SPACE)
    scored = trained.model.transform(training_frame.limit(20))
    assert scored.filter(scored.prediction.isNotNull()).count() == 20
