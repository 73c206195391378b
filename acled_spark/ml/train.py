"""Training: gradient-boosted regression + seeded random hyperparameter
search with K-fold CV (M6-M9, ref assets/ml.py:321-545).

The reference runs ``xgb.XGBRegressor`` under ``RandomizedSearchCV
(n_iter=50, cv=5, scoring=neg-RMSE, seed 42)``.  MLlib-native:
``GBTRegressor`` + ``CrossValidator`` over a randomly-SAMPLED param grid
(random search isn't built into MLlib; we sample 7 of the reference's 9 dims
with a seeded RNG — parity contract per SURVEY §7.4.4: same space, same
budget, seeded).  Fold fitting parallelizes across the cluster via
``CrossValidator(parallelism=...)`` — the Spark analog of ``n_jobs=-1``.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.regression import GBTRegressor
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42  # ref ml.py:26-27

# Search space mirroring the reference's XGB grid (7 of its 9 dims) where GBT has an
# equivalent knob (ref ml.py:408-419).
SEARCH_SPACE = {
    "maxIter": [20, 50, 100],             # n_estimators
    "maxDepth": [3, 4, 5, 6],             # max_depth
    "stepSize": [0.01, 0.05, 0.1, 0.2],   # learning_rate
    "subsamplingRate": [0.7, 0.8, 1.0],   # subsample
    "featureSubsetStrategy": ["all", "sqrt", "0.8"],  # colsample_bytree
    "minInstancesPerNode": [1, 3, 5],     # min_child_weight
    "minInfoGain": [0.0, 0.1],            # gamma
}

# GBT-name -> SparkXGBRegressor-name translation (SURVEY M7's preferred
# mapping, ref ml.py:390-420).  featureSubsetStrategy values are
# strategies, not fractions — mapped to the nearest colsample fraction.
XGB_PARAM_NAMES = {
    "maxIter": "n_estimators",
    "maxDepth": "max_depth",
    "stepSize": "learning_rate",
    "subsamplingRate": "subsample",
    "featureSubsetStrategy": "colsample_bytree",
    "minInstancesPerNode": "min_child_weight",
    "minInfoGain": "gamma",
}
_XGB_COLSAMPLE = {"all": 1.0, "sqrt": 0.6, "0.8": 0.8}
_XGB_COLSAMPLE_INV = {v: k for k, v in _XGB_COLSAMPLE.items()}


def make_estimator(kind: str, label_col: str, seed: int = SEED):
    """Estimator factory: ``gbt`` (MLlib-native default) or ``xgboost``
    (``xgboost.spark.SparkXGBRegressor``, import-gated — the library is
    optional; callers fall back to GBT when absent)."""
    if kind == "gbt":
        return GBTRegressor(featuresCol="features", labelCol=label_col, seed=seed)
    if kind == "xgboost":
        try:
            from xgboost.spark import SparkXGBRegressor
        except ImportError as exc:
            raise ImportError(
                "xgboost is not installed; use estimator='gbt' (the "
                "default MLlib mapping) or install xgboost>=1.7 for "
                "SparkXGBRegressor"
            ) from exc
        return SparkXGBRegressor(
            features_col="features", label_col=label_col, random_state=seed
        )
    raise ValueError(f"unknown estimator kind: {kind!r}")


def _estimator_param(est, gbt_name: str):
    """Resolve a SEARCH_SPACE (GBT-named) knob on either estimator."""
    have = {p.name for p in est.params}
    if gbt_name in have:
        return est.getParam(gbt_name), None
    xgb_name = XGB_PARAM_NAMES[gbt_name]
    if xgb_name in have:
        translate = _XGB_COLSAMPLE.get if gbt_name == "featureSubsetStrategy" else None
        return est.getParam(xgb_name), translate
    return None, None


@dataclass
class TrainedModel:
    model: PipelineModel
    best_params: dict
    metrics: dict = field(default_factory=dict)
    feature_importances: list[tuple[str, float]] = field(default_factory=list)


def sample_param_combos(n_candidates: int, seed: int = SEED) -> list[dict]:
    """Seeded random draw of ``n_candidates`` points from SEARCH_SPACE
    (capped at the space's size — the space is finite).  Estimator-
    agnostic: combos carry the canonical (GBT) knob names."""
    space_size = 1
    for values in SEARCH_SPACE.values():
        space_size *= len(values)
    n_candidates = min(n_candidates, space_size)
    rng = random.Random(seed)
    seen, combos = set(), []
    while len(combos) < n_candidates:
        combo = tuple(
            (name, rng.choice(values)) for name, values in SEARCH_SPACE.items()
        )
        if combo in seen:
            continue
        seen.add(combo)
        combos.append(dict(combo))
    return combos


def sample_param_maps(est, n_candidates: int, seed: int = SEED) -> list:
    """The same seeded draw rendered as ParamMaps for ``est`` — GBT or
    SparkXGBRegressor (names/values translated via XGB_PARAM_NAMES, so
    both estimators search the identical 7-knob space on the same
    budget: the SURVEY §7.4.4 parity contract)."""
    grids = []
    for combo in sample_param_combos(n_candidates, seed):
        b = ParamGridBuilder()
        for name, value in combo.items():
            param, translate = _estimator_param(est, name)
            if param is None:  # knob with no analog on this estimator
                continue
            b = b.addGrid(param, [translate(value) if translate else value])
        grids.extend(b.build())
    return grids


def train_regressor(
    features_df: DataFrame,
    feature_pipeline: Pipeline,
    label_col: str,
    n_candidates: int = 50,   # ref ml.py:29 n_iter=50
    n_folds: int = 5,         # ref ml.py:30 cv=5
    test_fraction: float = 0.2,
    seed: int = SEED,
    parallelism: int = 4,
    estimator: str = "gbt",
) -> TrainedModel:
    """M6 split -> M7 random-search CV -> M8 metrics -> M9 importances.

    ``estimator='xgboost'`` swaps in SparkXGBRegressor (ref ml.py:390-420
    verbatim-library parity) when the optional dependency is present;
    the search space, budget, folds, and seed are identical either way.
    """
    train, test = features_df.randomSplit(
        [1 - test_fraction, test_fraction], seed=seed
    )
    gbt = make_estimator(estimator, label_col, seed)
    evaluator = RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="rmse"
    )
    cv = CrossValidator(
        estimator=Pipeline(stages=[feature_pipeline, gbt]),
        estimatorParamMaps=sample_param_maps(gbt, n_candidates, seed),
        evaluator=evaluator,
        numFolds=n_folds,
        parallelism=parallelism,
        seed=seed,
    )
    cv_model = cv.fit(train)
    best = cv_model.bestModel

    def _eval(df: DataFrame) -> dict:
        # cache the scored frame: each evaluate() is its own Spark
        # action, so an uncached pred would re-run the whole feature
        # pipeline + model once per metric (3x per split)
        pred = best.transform(df).cache()
        try:
            return {
                metric: RegressionEvaluator(
                    labelCol=label_col,
                    predictionCol="prediction",
                    metricName=metric,
                ).evaluate(pred)
                for metric in ("rmse", "mae", "r2")
            }
        finally:
            pred.unpersist()

    train_m, test_m = _eval(train), _eval(test)
    metrics = {
        "train": train_m,
        "test": test_m,
        "cv_avg_rmse": min(cv_model.avgMetrics),
        # ref ml.py:499-508: overfit gap + generalization score
        "overfit_gap": abs(train_m["rmse"] - test_m["rmse"]),
        # clamped to [0, 1]: a negative test r2 (worse than the mean
        # predictor) must floor at 0, matching the else-branch floor
        "generalization": (
            max(0.0, min(test_m["r2"] / train_m["r2"], 1.0))
            if train_m["r2"] > 0
            else 0.0
        ),
    }

    fitted = best.stages[-1]
    assembler_attrs = _feature_names(best.transform(train.limit(1)))
    importances = sorted(
        zip(assembler_attrs, _importance_vector(fitted, len(assembler_attrs))),
        key=lambda kv: -kv[1],
    )
    best_params = {}
    for name in SEARCH_SPACE:
        param, translate = _estimator_param(fitted, name)
        if param is not None:
            value = fitted.getOrDefault(param)
            if translate is not None:
                # the fitted estimator holds the TRANSLATED value (e.g.
                # colsample_bytree=0.6); report the canonical GBT knob
                # value ('sqrt') so best_params stays a member of
                # SEARCH_SPACE and feeds straight back into GBTRegressor
                # for a reproduction run (round-7 review)
                value = _XGB_COLSAMPLE_INV.get(value, value)
            best_params[name] = value
    return TrainedModel(best, best_params, metrics, importances)


def _importance_vector(fitted_model, n_features: int) -> list[float]:
    """Per-feature importances for either estimator's fitted model."""
    if hasattr(fitted_model, "featureImportances"):  # GBTRegressionModel
        return fitted_model.featureImportances.toArray().tolist()
    if hasattr(fitted_model, "get_feature_importances"):  # xgboost.spark
        by_name = fitted_model.get_feature_importances()  # {'f0': w, ...}
        total = sum(by_name.values()) or 1.0
        return [by_name.get(f"f{i}", 0.0) / total for i in range(n_features)]
    return [0.0] * n_features


def _feature_names(transformed_sample: DataFrame) -> list[str]:
    """Feature names from the assembler's ML attribute metadata (M9)."""
    schema_field = transformed_sample.schema["features"]
    attrs = schema_field.metadata.get("ml_attr", {}).get("attrs", {})
    named = []
    for group in attrs.values():
        for a in group:
            named.append((a["idx"], a.get("name", f"f{a['idx']}")))
    if not named:
        # the sampled row can vanish (assembler handleInvalid='skip'
        # drops rows with NULL numeric features) — .first() is then
        # None and an unguarded [0] crashed AFTER the expensive CV had
        # already completed (r7 review)
        row = transformed_sample.select(F.col("features")).first()
        if row is None:
            raise ValueError(
                "cannot derive feature names: the sampled row was "
                "dropped by the assembler (NULL numeric features) and "
                "no ml_attr metadata is present — sample a complete row"
            )
        return [f"f{i}" for i in range(row[0].size)]
    return [name for _, name in sorted(named)]
