"""Embedding-column preprocessing for similarity pipelines.

Mean-centering + L2 normalization is the standard preprocessing in front
of cosine ANN (it removes the corpus-wide hubness bias); whitening/PCA
sit above it as a model pass. Everything here is built from Catalyst
array expressions — no Python in the path.

Determinism discipline: the corpus mean is a floating SUM over an
arbitrary partitioning, which is NOT reproducible in doubles (last-ulp
order dependence). The component sums are therefore taken over
floor(v * 1e6) integers — exact, associative, engine-portable (floor
avoids round()'s half-tie ambiguity across engines) — and converted to
a double mean with one division at the end. A 1e-6 quantization of the
MEAN only (the vectors themselves stay full precision) is far below any
embedding model's noise floor.

Scale shape: one dim-bounded aggregation (posexplode + groupBy(pos) with
map-side partial aggregation — 64 rows out regardless of corpus size),
the 1-row mean array broadcast back in-plan, then per-row zip_with /
aggregate expressions inside codegen. No corpus-wide shuffle of the
vectors themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _centered(
    df: DataFrame, id_col: str, vec_col: str, center: bool
) -> DataFrame:
    """(id_col, v: array<double>, norm: double) with v optionally
    corpus-mean-centered and norm its L2 length (pre-normalization)."""
    vec_d = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    base = df.select(F.col(id_col), vec_d.alias("v"))
    if center:
        exploded = base.select(F.posexplode("v").alias("pos", "val"))
        sums = exploded.groupBy("pos").agg(
            F.sum(F.floor(F.col("val") * 1e6).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        mean_row = sums.groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                lambda x: (x["s"].cast("double") / 1e6) / x["n"],
            ).alias("mean_vec")
        )
        base = base.crossJoin(F.broadcast(mean_row)).select(
            id_col,
            F.zip_with("v", "mean_vec", lambda a, b: a - b).alias("v"),
        )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    return base.select(id_col, "v", norm.alias("norm"))


def preprocess_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center: bool = True,
) -> DataFrame:
    """Returns (id_col, vec: array<double>, norm: double) where vec is
    the (optionally corpus-mean-centered) input scaled to unit L2 norm.
    Zero vectors keep norm 0 and a NULL unit vector."""
    base = _centered(df, id_col, vec_col, center)
    norm = F.col("norm")
    return base.select(
        id_col,
        F.when(
            norm > 0, F.transform("v", lambda x: x / norm)
        ).alias("vec"),
        "norm",
    )


def preprocess_embeddings_long(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center: bool = True,
) -> DataFrame:
    """Long/exploded variant of :func:`preprocess_embeddings` — one row
    per (id, position) with the unit-normalized component as a SCALAR
    column: (id_col, pos, component, norm). Zero vectors emit a row per
    position with NULL component (norm 0), so every input position is
    represented. Same plan shape as the array variant (the posexplode
    fuses into the projection); the long form is what joins, per-dim
    stats, and cross-engine comparison want."""
    base = _centered(df, id_col, vec_col, center)
    return base.select(
        id_col, F.posexplode("v").alias("pos", "cv"), "norm"
    ).select(
        id_col,
        "pos",
        F.when(F.col("norm") > 0, F.col("cv") / F.col("norm")).alias(
            "component"
        ),
        "norm",
    )
