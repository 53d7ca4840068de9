"""Stochastic Outlier Selection — FlinkML parity (SURVEY §2.11).

Reference: flink-libraries/flink-ml/.../outlier/StochasticOutlierSelection
.scala (Janssens et al., "Stochastic Outlier Selection", 2012):
1. dissimilarity = pairwise EUCLIDEAN distance, diagonal removed (:235-247)
2. per-point affinity a_ij = exp(-d_ij * beta_i), beta_i bisected until the
   row's entropy matches log(perplexity) (binarySearch :328-379; beta
   starts at 1, doubles/halves while unbounded, bisects once bracketed,
   beta/10 on NaN entropy)
3. binding probabilities b_ij = a_ij / sum_j a_ij (:276-278)
4. outlier probability phi_j = prod_i (1 - b_ij) over the COLUMN (:287-311)
Defaults match the reference: perplexity 30, tolerance 1e-20, 5000
iterations (:131-141).

Spark-first: SOS is inherently O(n²) with a column-product coupling every
point to every other — the reference cross-joins the ENTIRE DataSet
(computeDissimilarityVectors :235), so it is single-working-set by
design. Here each block is one Arrow batch into applyInPandas and the
whole algorithm is numpy matrix ops (the distance matrix is one gemm, the
beta search runs vectorized across all rows at once). `block_col=None`
scores the full frame as one block (the reference's semantics);
at 100 TB pass a block/shard column and score outliers within blocks —
the same contract embedding_cosine_pairs documents for its exact tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stochastic_outlier_selection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    perplexity: float = 30.0,
    max_iterations: int = 5000,
    error_tolerance: float = 1e-20,
    block_col: str | None = None,
) -> DataFrame:
    """Returns (id, outlier_prob) — higher = more outlying."""
    import math

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, outlier_prob double"
    log_perp = math.log(perplexity)

    def score(pdf):
        import numpy as np
        import pandas as pd

        V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        n = len(V)
        if n < 2:
            return pd.DataFrame({id_col: pdf[id_col], "outlier_prob": [1.0] * n})
        sq = np.einsum("ij,ij->i", V, V)
        D = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * (V @ V.T), 0.0))
        off = ~np.eye(n, dtype=bool)

        beta = np.ones(n)
        bmin = np.full(n, -np.inf)
        bmax = np.full(n, np.inf)
        A = np.zeros((n, n))
        active = np.ones(n, dtype=bool)
        for _ in range(max_iterations):
            A = np.exp(-D * beta[:, None]) * off
            sum_a = A.sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                h = np.log(sum_a) + beta * (D * A).sum(axis=1) / sum_a
            h_diff = h - log_perp
            active = np.abs(h_diff) > error_tolerance
            if not active.any():
                break
            # entropy too high (hDiff > 0) → sharpen with LARGER beta:
            # double while unbracketed, midpoint with betaMax once
            # bracketed; entropy too low → smaller beta, symmetric; NaN
            # entropy → beta/10 (:344-367). Bounds update uses the OLD
            # beta, as the recursion does.
            is_nan = np.isnan(h_diff) & active
            too_high = (h_diff > 0) & ~is_nan & active
            too_low = (h_diff < 0) & ~is_nan & active
            new_beta = beta.copy()
            unbounded_hi = np.isinf(bmax)
            m = too_high & unbounded_hi
            new_beta[m] = beta[m] * 2.0
            m = too_high & ~unbounded_hi
            new_beta[m] = (beta[m] + bmax[m]) / 2.0
            bmin[too_high] = beta[too_high]
            unbounded_lo = np.isinf(bmin)
            m = too_low & unbounded_lo
            new_beta[m] = beta[m] / 2.0
            m = too_low & ~unbounded_lo
            new_beta[m] = (beta[m] + bmin[m]) / 2.0
            bmax[too_low] = beta[too_low]
            new_beta[is_nan] = beta[is_nan] / 10.0
            beta = new_beta

        B = A / A.sum(axis=1, keepdims=True)
        phi = np.prod(1.0 - B, axis=0)  # column product; diagonal is 1-0
        return pd.DataFrame({id_col: pdf[id_col].values, "outlier_prob": phi})

    if block_col is None:
        grouped = (
            df.select(id_col, vec_col).withColumn("__blk__", F.lit(0)).groupBy("__blk__")
        )
    else:
        grouped = df.select(id_col, vec_col, block_col).groupBy(block_col)
    return grouped.applyInPandas(score, out_schema)
