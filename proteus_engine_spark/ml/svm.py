"""Soft-margin linear SVM via CoCoA (communication-efficient distributed
dual coordinate ascent) — DataFrame-native parity with the reference's
classification library.

Reference: flink-libraries/flink-ml/.../classification/SVM.scala — hinge
loss, per-block local SDCA with dual variables kept ACROSS outer
iterations (SVM.scala:428-429), CoCoA averaging of block updates
(``alphas += Δα·scaling``, ``w += ΣΔw_b·scaling`` with
scaling = stepsize/blocks — :375-380,496), and the single-coordinate dual
maximization of :516-545: ``grad = (y·w·x − 1)·(λ·n)``,
``α' = clip(α − grad/(x·x), 0, 1)``, ``Δw = x·y·(α'−α)/(λ·n)`` (the
reference computes a projected gradient at :528-534 but its executed
update branches on the RAW grad — mirrored as executed, not as the dead
variable suggests). Defaults mirror SVM.scala: 10 outer iterations, 10
local iterations, λ=1.0, stepsize=1.0.

Spark-first shape: points are blocked by ``id % blocks`` (the reference's
ModuloKeyPartitioner round-robin, :355-357); each outer iteration is ONE
applyInPandas over the blocks — the current weight vector rides the UDF
closure (the reference broadcasts it, :437), per-block Δw vectors come
back as data (blocks × dim, tiny) and reduce on the driver exactly like
the reference's ``weights.union(weightedDeltaWs).reduce(_+_)`` (:382).
The dual state (id, α) is a DataFrame column checkpointed per iteration —
never driver-resident; only the d-dimensional weight vector is.

Determinism (adaptation, documented): the reference's local SDCA samples
points with ``Random(seed ^ subtaskIndex)`` (:440) — irreproducible
across redeployments by construction. Here the local solver sweeps the
block's points ROUND-ROBIN in sorted-id order, and the sweep cursor
CARRIES ACROSS outer iterations (coordinate index =
``(outer·local_iterations + t) mod m``) so every point in a block is
visited regardless of block size — a block with more points than
``local_iterations`` still covers them all over successive outer
rounds, matching the reference sampler's every-point-in-expectation
coverage. The per-block Δw vectors come back tagged with their block id
and the driver reduce sums them in SORTED block order (float addition is
not associative; collect() row order follows shuffle layout, so an
unsorted sum could move the result across repartitionings). With both,
the whole optimization is a pure function of the data: the pure-numpy
mirror in tests/test_round12.py reproduces weights and duals BITWISE,
and reruns/repartitionings cannot move the result. Same dual math, same
persisted CoCoA state — only the coordinate-selection schedule is
derandomized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def svm_cocoa(
    data: DataFrame,
    id_col: str = "id",
    features_col: str = "features",
    label_col: str = "label",
    blocks: int = 8,
    iterations: int = 10,
    local_iterations: int = 10,
    regularization: float = 1.0,
    stepsize: float = 1.0,
) -> np.ndarray:
    """Train the CoCoA hinge-loss SVM; labels must be ±1. Returns the
    learned weight vector (numpy, dim = feature length) — the reference's
    ``weightsOption`` equivalent; score new points with
    ``svm_decision(df, w)``."""
    if blocks < 1 or iterations < 1 or local_iterations < 1:
        raise ValueError(
            f"blocks={blocks}, iterations={iterations}, "
            f"local_iterations={local_iterations} must all be >= 1"
        )
    pts = data.select(
        F.col(id_col).alias("id"),
        F.col(features_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
        (F.col(id_col) % blocks).alias("block"),
    ).persist()
    n = pts.count()  # numberVectors (the reference reduces a count too)
    if n == 0:
        pts.unpersist()
        raise ValueError("empty training set")
    dim = len(pts.select("x").first()["x"])
    scaling = stepsize / blocks
    ln = regularization * n

    alphas = pts.select("id", F.lit(0.0).alias("alpha"))
    w = np.zeros(dim)
    out_schema = "id long, alpha double, block long, dw array<double>"

    try:
        for outer in range(iterations):
            w_b = w.tolist()  # the broadcast weight vector (closure-shipped)
            cursor0 = outer * local_iterations  # sweep carries across outers

            def solve(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("id", kind="mergesort")
                x = np.stack(pdf["x"].to_numpy())
                y = pdf["y"].to_numpy(dtype=np.float64)
                persisted = pdf["alpha"].to_numpy(dtype=np.float64)
                temp = persisted.copy()  # SVM.scala:461 tempAlphas
                delta_a = np.zeros(len(pdf))
                w_local = np.array(w_b, dtype=np.float64)
                delta_w = np.zeros_like(w_local)
                m = len(pdf)
                for t in range(local_iterations):
                    # deterministic round-robin whose cursor carries across
                    # outer iterations: blocks larger than local_iterations
                    # still cover every point over successive outers
                    idx = (cursor0 + t) % m
                    xi, yi, a = x[idx], y[idx], temp[idx]
                    grad = (yi * (xi @ w_local) - 1.0) * ln  # SVM.scala:525
                    if grad != 0.0:
                        qii = xi @ xi
                        na = (
                            min(max(a - grad / qii, 0.0), 1.0) if qii != 0.0 else 1.0
                        )  # :538-542
                        dw = xi * (yi * (na - a) / ln)  # :544
                        temp[idx] = na
                        delta_a[idx] += na - a
                        w_local += dw
                        delta_w += dw
                out = pd.DataFrame(
                    {
                        "id": pdf["id"].to_numpy(),
                        "alpha": persisted + delta_a * scaling,  # :496
                        "block": pdf["block"].to_numpy(),
                        "dw": [None] * m,
                    }
                )
                out["dw"] = out["dw"].astype(object)
                out.iat[0, out.columns.get_loc("dw")] = delta_w
                return out

            step = (
                pts.join(alphas, "id")
                .groupBy("block")
                .applyInPandas(solve, out_schema)
                .localCheckpoint(eager=True)  # one job per outer iteration
            )
            alphas = step.select("id", "alpha")
            dws = step.filter(F.col("dw").isNotNull()).select("block", "dw").collect()
            # blocks × dim rows — the reference's union+reduce of ΔW
            # vectors; summed in sorted-block order (collect() row order
            # follows shuffle layout and float addition is not associative)
            dws.sort(key=lambda r: r.block)
            w = w + scaling * np.sum([np.array(r.dw) for r in dws], axis=0)
    finally:
        pts.unpersist()
    return w


def svm_decision(
    data: DataFrame,
    w: np.ndarray,
    features_col: str = "features",
    out_col: str = "decision",
) -> DataFrame:
    """Attach the decision value w·x as a column — a JVM-side
    zip_with/aggregate fold over a literal weight array, no Python in the
    scoring path (SVM.scala's predict emits the same raw decision value;
    threshold at 0 for the class)."""
    warr = F.array(*[F.lit(float(v)) for v in w])
    dot = F.aggregate(
        F.zip_with(F.col(features_col).cast("array<double>"), warr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return data.withColumn(out_col, dot)
