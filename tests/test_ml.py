"""ML library tests (FlinkML parity): OLS against numpy lstsq, scalers
against hand math, polynomial feature generation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proteus_engine_spark.ml import (
    linear_regression,
    min_max_scaler,
    polynomial_features,
    standard_scaler,
)


def test_linear_regression_matches_numpy(spark):
    rng = np.random.RandomState(7)
    X = rng.uniform(-5, 5, size=(500, 3))
    y = 2.5 * X[:, 0] - 1.25 * X[:, 1] + 0.5 * X[:, 2] + 3.0 + rng.normal(0, 0.3, 500)
    rows = [(float(y[i]), *map(float, X[i])) for i in range(500)]
    df = spark.createDataFrame(rows, "y double, a double, b double, c double")
    m = linear_regression(df, "y", ["a", "b", "c"])
    A = np.hstack([np.ones((500, 1)), X])
    ref, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert m.intercept == pytest.approx(ref[0], abs=1e-8)
    for got, want in zip(m.weights, ref[1:]):
        assert got == pytest.approx(want, abs=1e-8)
    assert 0.99 < m.r2 <= 1.0
    pred = m.predict(df).select("prediction").limit(1).collect()[0][0]
    want = m.intercept + sum(w * v for w, v in zip(m.weights, rows[0][1:]))
    assert pred == pytest.approx(want)


def test_linear_regression_skips_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 3.0), (4.0, None), (3.0, 3.0)],
        "y double, x double",
    )
    m = linear_regression(df, "y", ["x"])
    assert m.weights[0] == pytest.approx(1.0)
    assert m.intercept == pytest.approx(0.0, abs=1e-12)


def test_standard_scaler_population_std(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "x double")
    got = sorted(r["x_scaled"] for r in standard_scaler(df, ["x"]).collect())
    mu, sd = 2.5, np.std([1, 2, 3, 4])  # population std
    want = sorted((v - mu) / sd for v in [1.0, 2.0, 3.0, 4.0])
    assert got == pytest.approx(want)
    # zero-variance feature scales by 1.0 (reference guard)
    const = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    vals = [r["x_scaled"] for r in standard_scaler(const, ["x"]).collect()]
    assert vals == pytest.approx([0.0, 0.0])


def test_min_max_scaler_targets(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x double")
    got = sorted(
        r["x_scaled"]
        for r in min_max_scaler(df, ["x"], target_min=-1, target_max=1).collect()
    )
    assert got == pytest.approx([-1.0, 0.0, 1.0])


def test_polynomial_features_degree2(spark):
    df = spark.createDataFrame([(2.0, 3.0)], "a double, b double")
    row = polynomial_features(df, ["a", "b"], degree=2).collect()[0]
    assert row["poly_a_a"] == 4.0
    assert row["poly_a_b"] == 6.0
    assert row["poly_b_b"] == 9.0


def test_distance_metrics_hand_values(spark):
    from proteus_engine_spark.ml import distances as D

    df = spark.createDataFrame(
        [([3.0, 0.0], [0.0, 4.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        D.euclidean("a", "b").alias("euc"),
        D.squared_euclidean("a", "b").alias("sq"),
        D.manhattan("a", "b").alias("man"),
        D.chebyshev("a", "b").alias("che"),
        D.minkowski("a", "b", 3).alias("mink3"),
        D.cosine_distance("a", "b").alias("cos"),
        D.tanimoto_distance("a", "b").alias("tani"),
    ).collect()[0]
    assert r["euc"] == pytest.approx(5.0)
    assert r["sq"] == pytest.approx(25.0)
    assert r["man"] == pytest.approx(7.0)
    assert r["che"] == pytest.approx(4.0)
    assert r["mink3"] == pytest.approx((27 + 64) ** (1 / 3))
    assert r["cos"] == pytest.approx(1.0)  # orthogonal
    assert r["tani"] == pytest.approx(1.0)  # dot = 0
