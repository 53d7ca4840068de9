"""Feature preprocessing (FlinkML parity).

Reference: flink-libraries/flink-ml preprocessing —
StandardScaler.scala:35 (fit learns per-feature mean and POPULATION std
via the Youngs-Cramer one-pass merge :169-209, zero std defaults to 1.0;
transform maps x → ((x-mean)/std)·targetStd + targetMean),
MinMaxScaler.scala:37 (x → (x-min)/(max-min) rescaled to [targetMin,
targetMax]), PolynomialFeatures.scala:44 (monomials up to a degree).

Spark-first: fit is ONE JVM aggregation over the data; the learned
statistics ride a broadcast single-row cross join into the transform
projection — no driver round-trip, no Python, and the transform fuses
into whole-stage codegen with whatever follows it.
"""

from __future__ import annotations

from itertools import combinations_with_replacement

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def standard_scaler(
    df: DataFrame,
    cols: list[str],
    target_mean: float = 0.0,
    target_std: float = 1.0,
    suffix: str = "_scaled",
) -> DataFrame:
    """StandardScaler.scala:35: per-feature standardization to a target
    mean/std. Population std (the reference divides S by n, :200); a
    zero-std feature scales by 1.0 (:204-206)."""
    stats = df.agg(
        *[F.avg(c).alias(f"__mu_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"__sd_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        sd = F.when(F.col(f"__sd_{c}") == 0.0, F.lit(1.0)).otherwise(F.col(f"__sd_{c}"))
        out = out.withColumn(
            c + suffix,
            ((F.col(c) - F.col(f"__mu_{c}")) / sd) * target_std + target_mean,
        )
    return out.drop(*[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols])


def min_max_scaler(
    df: DataFrame,
    cols: list[str],
    target_min: float = 0.0,
    target_max: float = 1.0,
    suffix: str = "_scaled",
) -> DataFrame:
    """MinMaxScaler.scala:34: rescale each feature's observed [min, max]
    onto [target_min, target_max]; a constant feature (range 0) maps to
    target_min — exactly the reference's guard (:255-256 sets the zero
    range to 1, so (x-min)/1·span + target_min = target_min)."""
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        scaled = (F.col(c) - F.col(f"__mn_{c}")) / rng * (
            target_max - target_min
        ) + target_min
        out = out.withColumn(
            c + suffix, F.when(rng == 0.0, F.lit(target_min)).otherwise(scaled)
        )
    return out.drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])


def polynomial_features(
    df: DataFrame, cols: list[str], degree: int = 2, prefix: str = "poly"
) -> DataFrame:
    """PolynomialFeatures.scala:44: append all monomials of the input
    features up to `degree` (cross terms included), named
    `{prefix}_{c1}_{c2}...`. Pure projection — no pass over the data."""
    out = df
    for d in range(2, degree + 1):
        for combo in combinations_with_replacement(cols, d):
            expr = F.col(combo[0])
            for c in combo[1:]:
                expr = expr * F.col(c)
            out = out.withColumn(f"{prefix}_" + "_".join(combo), expr)
    return out


def train_test_split(
    df: DataFrame, fraction: float = 0.75, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Splitter.scala randomSplit parity: partition rows into
    (train, test) with P(train) = fraction, disjoint and exhaustive.
    Deterministic per seed; Spark's native randomSplit performs the
    per-partition Bernoulli assignment the reference's RichMapFunction
    does."""
    if not 0.0 < fraction < 1.0:
        raise ValueError("fraction must be in (0, 1)")
    train, test = df.randomSplit([fraction, 1.0 - fraction], seed=seed)
    return train, test
