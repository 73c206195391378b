"""ML surface (SURVEY §2.9 M1-M10): feature encoding, CV training,
batch scoring + error analytics — MLlib-native."""

from acled_spark.ml.features import (  # noqa: F401
    TargetEncoder,
    add_distance_from_center,
    build_feature_pipeline,
    label_encode_fit,
    label_encode_transform,
    out_of_fold_target_encode,
)
from acled_spark.ml.score import error_analysis, risk_level  # noqa: F401
from acled_spark.ml.train import TrainedModel, train_regressor  # noqa: F401
