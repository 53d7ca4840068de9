"""ML library subset (SURVEY §2.11 — FlinkML re-expressed Spark-first)."""

from proteus_engine_spark.ml.als import als, als_predict, init_factors_np
from proteus_engine_spark.ml.outlier import stochastic_outlier_selection
from proteus_engine_spark.ml.preprocessing import (
    min_max_scaler,
    polynomial_features,
    standard_scaler,
    train_test_split,
)
from proteus_engine_spark.ml.regression import LinearRegressionModel, linear_regression
from proteus_engine_spark.ml.svm import svm_cocoa, svm_decision

__all__ = [
    "LinearRegressionModel",
    "als",
    "als_predict",
    "init_factors_np",
    "linear_regression",
    "min_max_scaler",
    "polynomial_features",
    "standard_scaler",
    "stochastic_outlier_selection",
    "svm_cocoa",
    "svm_decision",
    "train_test_split",
]
