"""Distance metrics (FlinkML parity).

Reference: flink-libraries/flink-ml metrics/distances/ —
EuclideanDistanceMetric.scala:30, SquaredEuclideanDistanceMetric.scala:30,
ManhattanDistanceMetric.scala:30, ChebyshevDistanceMetric.scala:31,
MinkowskiDistanceMetric.scala:33 (order-p norm),
CosineDistanceMetric.scala:31 (1 - cos similarity),
TanimotoDistanceMetric.scala:30 (1 - dot/(|a|²+|b|²-dot)).

Spark-first: every metric is a pure Catalyst COLUMN EXPRESSION over two
array<double> columns (zip_with + aggregate — JVM higher-order functions,
no UDF, fuses into whole-stage codegen), so distances compose freely into
joins/filters/aggregations: `df.select(euclidean("a", "b"))` plans like
any arithmetic. The gemm/BLAS paths in `datapipe` remain the bulk
all-pairs route; these are the row-wise metric surface the reference's
DistanceMetric trait exposes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _arr(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("array<double>")


def _diffs(a, b) -> Column:
    return F.zip_with(_arr(a), _arr(b), lambda x, y: x - y)


def _fold(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a, b) -> Column:
    return _fold(F.zip_with(_arr(a), _arr(b), lambda x, y: x * y))


def squared_euclidean(a, b) -> Column:
    """SquaredEuclideanDistanceMetric.scala:30: Σ(aᵢ-bᵢ)²."""
    return _fold(F.transform(_diffs(a, b), lambda x: x * x))


def euclidean(a, b) -> Column:
    """EuclideanDistanceMetric.scala:30: √Σ(aᵢ-bᵢ)²."""
    return F.sqrt(squared_euclidean(a, b))


def manhattan(a, b) -> Column:
    """ManhattanDistanceMetric.scala:30: Σ|aᵢ-bᵢ|."""
    return _fold(F.transform(_diffs(a, b), F.abs))


def chebyshev(a, b) -> Column:
    """ChebyshevDistanceMetric.scala:31: max |aᵢ-bᵢ|."""
    return F.array_max(F.transform(_diffs(a, b), F.abs))


def minkowski(a, b, p: float) -> Column:
    """MinkowskiDistanceMetric.scala:33: (Σ|aᵢ-bᵢ|ᵖ)^(1/p)."""
    return F.pow(
        _fold(F.transform(_diffs(a, b), lambda x: F.pow(F.abs(x), F.lit(p)))),
        F.lit(1.0 / p),
    )


def cosine_distance(a, b) -> Column:
    """CosineDistanceMetric.scala:31: 1 - a·b / (‖a‖‖b‖)."""
    return F.lit(1.0) - dot(a, b) / (
        F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    )


def tanimoto_distance(a, b) -> Column:
    """TanimotoDistanceMetric.scala:30: 1 - a·b / (‖a‖² + ‖b‖² - a·b)."""
    d = dot(a, b)
    return F.lit(1.0) - d / (dot(a, a) + dot(b, b) - d)
