"""Oracle gates for the ML library (SURVEY §2.11, FlinkML parity —
ml/regression.py, ml/preprocessing.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proteus_engine_spark.queries.registry import register
from proteus_engine_spark.sources import load_table


@register(
    "ml_linreg_price_vs_qty",
    oracle="""
    SELECT regr_slope(l_extendedprice, l_quantity) AS slope,
           regr_intercept(l_extendedprice, l_quantity) AS intercept,
           regr_r2(l_extendedprice, l_quantity) AS r2
    FROM lineitem
    """,
    tags=("ml", "regression"),
)
def ml_linreg_price_vs_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression gate (MultipleLinearRegression.scala:67, model =
    WeightVector): OLS of extended price on quantity over the whole
    lineitem table — one JVM moment pass, driver-side 2×2 solve. The
    oracle is DuckDB's regr_slope/regr_intercept/regr_r2, which define the
    same least-squares line, so slope, intercept AND fit quality must all
    agree (to the 6-decimal float hash) despite the entirely different
    computation paths."""
    from proteus_engine_spark.ml import linear_regression

    li = load_table(spark, sf_dir, "lineitem")
    m = linear_regression(li, "l_extendedprice", ["l_quantity"])
    return spark.createDataFrame(
        [(m.weights[0], m.intercept, m.r2)], "slope double, intercept double, r2 double"
    )


@register(
    "ml_feature_scaling",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_tax
      FROM lineitem WHERE l_partkey < 30
    ),
    s AS (
      SELECT avg(l_quantity) AS mu, stddev_pop(l_quantity) AS sd,
             min(l_tax) AS mn, max(l_tax) AS mx
      FROM base
    )
    SELECT l_orderkey, l_linenumber,
           (l_quantity - mu) / (CASE WHEN sd = 0 THEN 1 ELSE sd END) AS l_quantity_scaled,
           CASE WHEN mx = mn THEN 0
                ELSE (l_tax - mn) / (mx - mn) END AS l_tax_scaled
    FROM base, s
    """,
    tags=("ml", "preprocessing"),
)
def ml_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaler gate (StandardScaler.scala:35 — population std, zero-std→1
    guard; MinMaxScaler.scala:37 — zero-range→target_min guard): quantity
    standardized and tax min-max-rescaled per row over a filtered slice;
    both fit passes run on the same slice the oracle aggregates. The
    learned statistics travel as a broadcast single-row join, so the
    transform stays one codegen projection."""
    from proteus_engine_spark.ml import min_max_scaler, standard_scaler

    base = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
        # Each chained scaler references its input twice (fit aggregate +
        # transform join) so the lazy slice expanded 4x through the two
        # scalers (r17 scan audit: lineitem 4x in this plan). Pin the
        # bounded probe slice once.
        .localCheckpoint(eager=True)
    )
    scaled = min_max_scaler(standard_scaler(base, ["l_quantity"]), ["l_tax"])
    return scaled.select(
        "l_orderkey", "l_linenumber", "l_quantity_scaled", "l_tax_scaled"
    )


@register(
    "ml_distance_metrics",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id <= 20)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           sqrt(list_sum([(a.e[i] - b.e[i])^2 for i in generate_series(1, len(a.e))])) AS euclidean,
           list_sum([abs(a.e[i] - b.e[i]) for i in generate_series(1, len(a.e))]) AS manhattan,
           list_max([abs(a.e[i] - b.e[i]) for i in generate_series(1, len(a.e))]) AS chebyshev,
           1 - list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cosine_dist,
           1 - list_dot_product(a.e, b.e)
             / (list_dot_product(a.e, a.e) + list_dot_product(b.e, b.e)
                - list_dot_product(a.e, b.e)) AS tanimoto_dist
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    """,
    tags=("ml", "distance"),
)
def ml_distance_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-metric gate (metrics/distances/ — Euclidean :30, Manhattan
    :30, Chebyshev :31, Cosine :31, Tanimoto :30): five metrics over every
    pair of the first 20 embeddings, computed as pure Catalyst
    zip_with/aggregate expressions (no UDF in the plan) and mirrored in
    DuckDB list arithmetic. Five formulas per row make any sign, norm, or
    fold error visible."""
    from proteus_engine_spark.ml import distances as D

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") <= 20)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b",
        D.euclidean("ea", "eb").alias("euclidean"),
        D.manhattan("ea", "eb").alias("manhattan"),
        D.chebyshev("ea", "eb").alias("chebyshev"),
        D.cosine_distance("ea", "eb").alias("cosine_dist"),
        D.tanimoto_distance("ea", "eb").alias("tanimoto_dist"),
    )


@register(
    "ml_outlier_sos",
    tags=("ml", "outlier"),
)
def ml_outlier_sos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic Outlier Selection (flink-ml outlier/
    StochasticOutlierSelection.scala — perplexity-bound Gaussian
    affinities, binding probabilities, column-product outlier score) over
    the embeddings corpus. No SQL oracle: the per-point perplexity
    bisection is not SQL-expressible — rows-only driver check; value
    correctness is pytest-proven against an independently-written scalar
    reference implementation (tests/test_round7.py) plus planted-outlier
    properties."""
    from proteus_engine_spark.ml import stochastic_outlier_selection

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return stochastic_outlier_selection(emb, perplexity=30.0)


@register(
    "ml_als_factorization",
    tags=("ml", "recommendation"),
)
def ml_als_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS-WR matrix factorization (flink-ml recommendation/ALS.scala —
    weighted-λ ridge alternation, λ·n_i diagonal + dposv solve,
    ALS.scala:53,697,703) on implicit TPC-H feedback: customer×part
    ratings = average ordered quantity, factored at the reference's
    default λ=1.0 with rank 8 over 3 sweeps. Emits a 1-row training
    summary — pair/user/item counts and the training RMSE with squared
    residuals rounded to 1e-6 and summed in DECIMAL, so the verdict is
    order-independent and stable across runs/partitionings. No SQL
    oracle: the alternating ridge solves are iterative, not
    SQL-expressible — rows-only driver check; value correctness is
    pytest-proven BITWISE against a pure-numpy mirror (the deterministic
    hash init + sorted-accumulation discipline makes the factors exactly
    reproducible, tests/test_round12.py), plus loss-decrease and
    reconstruction properties. Runs the BLOCKED solve path (blocks=64,
    2× the local core count): ~entities/64 ridge solves amortize each
    applyInPandas call's Arrow/pandas fixed cost — bitwise-identical
    factors (the blocked-path mirror test pins it), materially faster
    wall-clock than one pandas group per entity."""
    from proteus_engine_spark.ml import als, als_predict

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ratings = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
        )
        .agg(F.avg("l_quantity").alias("rating"))
    )
    users, items = als(ratings, rank=8, reg=1.0, iterations=3, blocks=64)
    preds = als_predict(ratings, users, items)
    res2 = F.round(
        F.pow(F.col("rating") - F.col("prediction"), F.lit(2)), 6
    ).cast("decimal(28,6)")
    return preds.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("user").alias("n_users"),
        F.countDistinct("item").alias("n_items"),
        F.round(
            F.sqrt(F.sum(res2).cast("double") / F.count(F.lit(1))), 6
        ).alias("train_rmse"),
    )


@register(
    "ml_svm_classify",
    tags=("ml", "classification"),
)
def ml_svm_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CoCoA soft-margin SVM (flink-ml classification/SVM.scala — per-block
    SDCA with persisted duals, CoCoA-scaled averaging, the :516-545 single-
    coordinate dual update) on the embeddings corpus: binary task label<5
    vs label>=5 over the 64-dim vectors, λ=0.01, 10 outer sweeps with a
    deterministic round-robin local solver (the documented derandomization
    of the reference's seeded sampler). Emits a 1-row training summary —
    point/dim counts, training accuracy, and weight checksums rounded to
    1e-6 — bitwise-stable across runs because the whole optimization is a
    pure function of the data (no RNG state anywhere). No SQL oracle:
    CoCoA is iterative, not SQL-expressible — rows-only driver check;
    value correctness is pytest-proven BITWISE against a pure-numpy mirror
    plus a separable-data accuracy property (tests/test_round12.py)."""
    import numpy as np

    from proteus_engine_spark.ml import svm_cocoa, svm_decision

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
        F.when(F.col("label") < 5, 1.0).otherwise(-1.0).alias("y"),
    )
    w = svm_cocoa(
        emb, id_col="id", features_col="features", label_col="y",
        blocks=8, iterations=10, local_iterations=100, regularization=0.01,
    )
    scored = svm_decision(emb, w)
    return scored.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.lit(int(len(w))).alias("dim"),
        F.round(
            F.avg(F.when(F.signum("decision") == F.col("y"), 1.0).otherwise(0.0)), 6
        ).alias("train_accuracy"),
        F.lit(round(float(np.sum(w)), 6)).alias("w_sum"),
        F.lit(round(float(np.abs(w).sum()), 6)).alias("w_l1"),
    )
