"""Multiple linear regression (FlinkML parity).

Reference: flink-libraries/flink-ml regression/
MultipleLinearRegression.scala:67 — fits y = wᵀx + b by minimizing squared
loss; the model is a WeightVector (weights, intercept), prediction is the
dot product (:226). The reference optimizes with distributed SGD
(optimization/GradientDescent.scala) because DataSet has no cheap
closed-form path; squared loss is convex, so SGD converges to the same
OLS solution the normal equations give.

Spark-first: ONE JVM aggregation computes every moment the normal
equations need — the (d+1)×(d+1) Gram matrix XᵀX and XᵀY as Σxᵢxⱼ /
Σxᵢy sums (map-side combined, no shuffle of rows, no Python in the data
path) — and the driver solves the tiny system with numpy. d is feature
count, so the driver work is O(d³) on d ~ tens: the same
bounded-small-model sync any distributed OLS does. Prediction is a pure
projection (whole-stage codegen)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LinearRegressionModel:
    """WeightVector parity (common/WeightVector.scala): per-feature
    weights + intercept, with squared-loss training metrics."""

    features: tuple[str, ...]
    weights: tuple[float, ...]
    intercept: float
    r2: float

    def predict(self, df: DataFrame, out: str = "prediction") -> DataFrame:
        """PredictOperation parity (MultipleLinearRegression.scala:226):
        prediction = wᵀx + b as a codegen projection."""
        expr = F.lit(self.intercept)
        for c, w in zip(self.features, self.weights):
            expr = expr + F.lit(w) * F.col(c)
        return df.withColumn(out, expr)


def linear_regression(
    df: DataFrame, label: str, features: list[str]
) -> LinearRegressionModel:
    """Fit OLS via normal equations: (XᵀX)w = Xᵀy with a bias column.
    Rows with a NULL label or feature are excluded (standard OLS
    contract). r2 = 1 - SSE/SST comes from the same moment pass."""
    import numpy as np

    for c in [label] + features:
        df = df.filter(F.col(c).isNotNull())
    cols = [F.lit(1.0).alias("__b__")] + [
        F.col(c).cast("double").alias(c) for c in features
    ]
    terms = ["__b__"] + list(features)
    x = df.select(*cols, F.col(label).cast("double").alias("__y__"))
    aggs = []
    for i, ci in enumerate(terms):
        for cj in terms[i:]:
            aggs.append(F.sum(F.col(ci) * F.col(cj)).alias(f"xx_{ci}__{cj}"))
        aggs.append(F.sum(F.col(ci) * F.col("__y__")).alias(f"xy_{ci}"))
    aggs += [F.sum(F.col("__y__") * F.col("__y__")).alias("yy"), F.count(F.lit(1)).alias("n")]
    row = x.agg(*aggs).collect()[0]

    d = len(terms)
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for i, ci in enumerate(terms):
        for j in range(i, d):
            v = row[f"xx_{ci}__{terms[j]}"]
            xtx[i, j] = xtx[j, i] = v
        xty[i] = row[f"xy_{ci}"]
    w = np.linalg.solve(xtx, xty)
    # SSE = yᵀy - wᵀXᵀy (normal-equation identity); SST = yᵀy - n·ȳ²
    sse = row["yy"] - float(w @ xty)
    ybar = xty[0] / row["n"]
    sst = row["yy"] - row["n"] * ybar * ybar
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    return LinearRegressionModel(
        features=tuple(features),
        weights=tuple(float(v) for v in w[1:]),
        intercept=float(w[0]),
        r2=float(r2),
    )
