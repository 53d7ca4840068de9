"""Alternating Least Squares matrix factorization (explicit feedback,
weighted-λ regularization) — DataFrame-native parity with the reference's
recommendation library.

Reference: flink-libraries/flink-ml/.../recommendation/ALS.scala —
minimize ``Σ_(i,j∈R) (r_ij − u_i·v_j)² + λ(Σ_i n_i‖u_i‖² + Σ_j n_j‖v_j‖²)``
(ALS.scala:50-57, the Zhou et al. weighted-λ-regularization scheme), by
alternating per-entity ridge solves: fix V, then for every user i solve
``(Y_iᵀY_i + λ·n_i·I) u_i = Y_iᵀ r_i`` (ALS.scala:697 adds
``lambda * numRatings(i)`` to the diagonal, ALS.scala:703 solves with
LAPACK dposv), then symmetrically for items. Defaults mirror the
reference: rank 10, λ 1.0 (ALS.scala:265,269).

Spark-first shape (the reference hand-builds block routing tables —
OutBlockInformation/InBlockInformation — to co-locate ratings with
factors; here the exchange IS the join):

- Each half-iteration is ONE join (ratings ⋈ fixed-side factors on the
  fixed-side key) + ONE applyInPandas grouped by the solved-side key.
  The join shuffles (user, item, rating, rank×8B vector); the groupBy
  reuses Spark's hash partitioning. Nothing is collected to the driver;
  factor frames are corpus-keyed DataFrames throughout.
- Each solved factor frame is eagerly localCheckpoint-ed per
  half-iteration: ALS lineage doubles per sweep (the solved side feeds
  the next solve of the other side), and without truncation the plan
  tree grows exponentially with iterations — the same discipline as the
  graph library's superstep engine.
- Per-group math is vectorized BLAS (Yᵀ@Y gram, Yᵀ@r, np.linalg.solve)
  over Arrow batches — no per-row Python.

Determinism (the property the parity tests lean on): initial item
factors are an integer-hash LCG of (item, f) — no RNG state — and every
per-entity gram/right-hand side is accumulated over rows SORTED by the
counterpart id, so the float accumulation order is fixed across runs,
partitionings, and the pure-numpy mirror (tests/test_round12.py) — the
mirror reproduces factors BITWISE, not approximately.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# init hash constants (int64-safe: (id % M)·A + f·B + 1 < 2^34)
_M = 1_000_003
_A = 8191
_B = 127


def _init_factor_expr(key_col: str, rank: int):
    """Deterministic item-factor init in [0, 1): an integer-hash LCG of
    (key, f) — engine-portable and exactly reproducible in numpy."""
    return F.array(
        *[
            (
                ((F.col(key_col) % _M) * _A + F.lit(f * _B + 1)) % _M
            ).cast("double")
            / F.lit(float(_M))
            for f in range(rank)
        ]
    )


def init_factors_np(keys: np.ndarray, rank: int) -> np.ndarray:
    """The numpy mirror of _init_factor_expr (tests use it; exported so
    the mirror and the engine can never drift apart silently)."""
    k = (keys.astype(np.int64) % _M)[:, None] * _A
    f = np.arange(rank, dtype=np.int64)[None, :] * _B + 1
    return ((k + f) % _M).astype(np.float64) / float(_M)


def _solve_side(
    ratings: DataFrame,
    fixed: DataFrame,
    solve_key: str,
    fixed_key: str,
    rank: int,
    reg: float,
    blocks: int | None = None,
) -> DataFrame:
    """One half-iteration: ridge-solve every `solve_key` entity against
    the fixed side's factors. Join on the fixed key, group by the solved
    key, per-group (YᵀY + λ·n·I) w = Yᵀr over rows sorted by fixed id.

    ``blocks=None`` (reference-exact default): one pandas group per
    entity. ``blocks=B``: group by ``solve_key % B`` and solve the whole
    BLOCK of entities inside one pandas call — the per-group Arrow/pandas
    fixed cost (the dominant term when entities are small) is paid B
    times instead of once per entity, the reference's
    OutBlockInformation/InBlockInformation block-routing insight
    (ALS.scala:355-357 ModuloKeyPartitioner). The per-entity math is
    UNCHANGED — rows sort by (solve_key, fixed_key), so every entity's
    gram/rhs accumulates in exactly the per-entity path's order and both
    paths (and the pure-numpy mirror) agree BITWISE."""
    j = ratings.join(fixed.withColumnRenamed("factors", "fvec"), fixed_key)
    out_schema = f"{solve_key} long, factors array<double>"

    def solve_entity(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(fixed_key, kind="mergesort")  # fixed accumulation order
        y = np.stack(pdf["fvec"].to_numpy())  # n × rank
        r = pdf["rating"].to_numpy(dtype=np.float64)
        n = len(pdf)
        a = y.T @ y + reg * n * np.eye(rank)  # ALS.scala:697 λ·n_i diagonal
        b = y.T @ r
        w = np.linalg.solve(a, b)  # spd system (dposv in the reference)
        return pd.DataFrame({solve_key: [pdf[solve_key].iloc[0]], "factors": [w]})

    def solve_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([solve_key, fixed_key], kind="mergesort")
        y = np.stack(pdf["fvec"].to_numpy())
        r = pdf["rating"].to_numpy(dtype=np.float64)
        keys = pdf[solve_key].to_numpy()
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        out_keys, out_factors = [], []
        eye = np.eye(rank)
        for s, e in zip(bounds[:-1], bounds[1:]):
            ye = y[s:e]
            a = ye.T @ ye + reg * (e - s) * eye
            b = ye.T @ r[s:e]
            out_keys.append(keys[s])
            out_factors.append(np.linalg.solve(a, b))
        return pd.DataFrame({solve_key: out_keys, "factors": out_factors})

    if blocks is None:
        out = j.groupBy(solve_key).applyInPandas(solve_entity, out_schema)
    else:
        out = (
            j.withColumn("_blk", F.col(solve_key) % blocks)
            .groupBy("_blk")
            .applyInPandas(solve_block, out_schema)
        )
    # truncate the doubling lineage (see module docstring)
    return out.localCheckpoint(eager=True)


def als(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    rank: int = 10,
    reg: float = 1.0,
    iterations: int = 10,
    blocks: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train ALS-WR on an explicit (user, item, rating) frame. Returns
    (user_factors, item_factors) as DataFrames of (key, array<double>).
    Defaults mirror ALS.scala (rank 10, λ 1.0, 10 sweeps).

    ``blocks``: solve a block of ``key % blocks`` entities per
    applyInPandas call instead of one entity per call — bitwise-identical
    factors (the per-entity accumulation order is preserved; pytest pins
    both paths against the same numpy mirror), but the per-group
    Arrow/pandas overhead — the dominant cost when entities are small —
    amortizes over the block. Pick ~2-4× the executor-core count; None
    keeps the reference-exact per-entity grouping."""
    if rank < 1 or iterations < 1:
        raise ValueError(f"rank={rank} and iterations={iterations} must be >= 1")
    if blocks is not None and blocks < 1:
        raise ValueError(f"blocks={blocks} must be >= 1 (or None)")
    r = ratings.select(
        F.col(user_col).alias("user"),
        F.col(item_col).alias("item"),
        F.col(rating_col).cast("double").alias("rating"),
    )
    items = (
        r.select("item").distinct().select("item", _init_factor_expr("item", rank).alias("factors"))
    )
    users = None
    for _ in range(iterations):
        users = _solve_side(r, items, "user", "item", rank, reg, blocks)
        items = _solve_side(r, users, "item", "user", rank, reg, blocks)
    return users, items


def als_predict(
    ratings: DataFrame,
    users: DataFrame,
    items: DataFrame,
) -> DataFrame:
    """Score (user, item) pairs of `ratings` under the trained factors:
    two key joins, a JVM-side zip_with dot product — no Python in the
    scoring path. Returns (user, item, rating, prediction)."""
    dot = F.aggregate(
        F.zip_with("uf", "vf", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        ratings.join(users.withColumnRenamed("factors", "uf"), "user")
        .join(items.withColumnRenamed("factors", "vf"), "item")
        .select("user", "item", "rating", dot.alias("prediction"))
    )
