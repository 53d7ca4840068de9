"""Scalar-function sampler queries: exercise the §2.8 catalog through the
engine's ``fn()`` dispatch with DuckDB oracles.

Cross-engine notes baked into the oracles:
- libm functions (exp/ln/sin/...) can differ in the last ulp between the
  JVM and DuckDB → transcendental outputs are rounded to 6 decimals on
  both sides.
- Spark CAST(double AS INT) truncates toward zero (Java semantics) while
  DuckDB rounds → oracle uses explicit FLOOR/ROUND so both engines compute
  the same thing (documented semantic difference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proteus_engine_spark.functions import fn
from proteus_engine_spark.queries.registry import register
from proteus_engine_spark.sources import load_table


@register(
    "fn_string_suite",
    oracle="""
    SELECT c_custkey,
           length(c_name)                    AS name_len,
           upper(c_name)                     AS name_upper,
           lower(c_mktsegment)               AS seg_lower,
           substring(c_name, 1, 8)           AS name_prefix,
           concat(c_name, '/', c_mktsegment) AS name_seg,
           trim(concat(' ', c_name, ' '))    AS name_trimmed,
           strpos(c_name, '0')               AS zero_pos,
           (c_name LIKE 'Customer%')         AS is_customer,
           replace(c_mktsegment, 'E', '3')   AS seg_leet,
           reverse(c_mktsegment)             AS seg_rev,
           lpad(c_mktsegment, 12, '.')       AS seg_padded
    FROM customer
    """,
    tags=("functions",),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAR_LENGTH/UPPER/LOWER/SUBSTRING/CONCAT/TRIM/POSITION/LIKE
    (FunctionCatalog.scala:181–195) + replace/reverse/lpad supersets."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        fn("CHAR_LENGTH", "c_name").alias("name_len"),
        fn("UPPER", "c_name").alias("name_upper"),
        fn("LOWER", "c_mktsegment").alias("seg_lower"),
        fn("SUBSTRING", "c_name", 1, 8).alias("name_prefix"),
        fn("CONCAT", "c_name", F.lit("/"), "c_mktsegment").alias("name_seg"),
        fn("TRIM", fn("CONCAT", F.lit(" "), "c_name", F.lit(" "))).alias("name_trimmed"),
        fn("POSITION", "0", "c_name").alias("zero_pos"),
        fn("LIKE", "c_name", "Customer%").alias("is_customer"),
        F.replace(F.col("c_mktsegment"), F.lit("E"), F.lit("3")).alias("seg_leet"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.lpad(F.col("c_mktsegment"), 12, ".").alias("seg_padded"),
    )


@register(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25)                   AS abs_dev,
           CAST(ceil(l_discount * 100) AS BIGINT)  AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT)      AS tax_pct_floor,
           round(exp(l_discount), 6)              AS exp_disc,
           round(ln(l_quantity), 6)               AS ln_qty,
           round(log10(l_extendedprice), 6)       AS log10_price,
           round(pow(l_quantity, 2), 6)           AS qty_sq,
           round(sqrt(l_quantity), 6)             AS qty_sqrt,
           CAST(l_orderkey % 7 AS BIGINT)         AS key_mod7,
           round(sin(l_quantity), 6)              AS sin_qty,
           round(1.0 / tan(l_quantity), 6)        AS cot_qty,
           CAST(sign(l_quantity - 25) AS DOUBLE)  AS sign_dev,
           round(l_extendedprice, 1)              AS price_r1
    FROM lineitem WHERE l_orderkey < 500
    """,
    tags=("functions",),
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABS/CEIL/FLOOR/EXP/LN/LOG10/POWER/MOD/SQRT/SIN/COT/SIGN/ROUND
    (FunctionCatalog.scala:198–226). COT is 1/tan (no native cot), matching
    the reference's ScalarOperators codegen."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fn("ABS", F.col("l_quantity") - 25).alias("abs_dev"),
        fn("CEIL", F.col("l_discount") * 100).alias("disc_pct_ceil"),
        fn("FLOOR", F.col("l_tax") * 100).alias("tax_pct_floor"),
        fn("ROUND", fn("EXP", "l_discount"), 6).alias("exp_disc"),
        fn("ROUND", fn("LN", "l_quantity"), 6).alias("ln_qty"),
        fn("ROUND", fn("LOG10", "l_extendedprice"), 6).alias("log10_price"),
        fn("ROUND", fn("POWER", "l_quantity", F.lit(2)), 6).alias("qty_sq"),
        fn("ROUND", fn("SQRT", "l_quantity"), 6).alias("qty_sqrt"),
        fn("MOD", "l_orderkey", F.lit(7)).alias("key_mod7"),
        fn("ROUND", fn("SIN", "l_quantity"), 6).alias("sin_qty"),
        fn("ROUND", fn("COT", "l_quantity"), 6).alias("cot_qty"),
        fn("SIGN", F.col("l_quantity") - 25).alias("sign_dev"),
        fn("ROUND", "l_extendedprice", 1).alias("price_r1"),
    )


@register(
    "fn_temporal_suite",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)     AS o_year,
           EXTRACT(month FROM o_orderdate)    AS o_month,
           EXTRACT(day FROM o_orderdate)      AS o_day,
           EXTRACT(quarter FROM o_orderdate)  AS o_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('year', o_orderdate) AS TIMESTAMP)  AS year_start,
           o_orderdate + INTERVAL 30 DAY      AS due_date,
           o_orderdate + INTERVAL 2 MONTH     AS review_date
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("functions",),
)
def fn_temporal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT/QUARTER/FLOOR-to-unit/TIMESTAMP_ADD
    (FunctionCatalog.scala:229–238)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        fn("EXTRACT", "YEAR", "o_orderdate").cast("long").alias("o_year"),
        fn("EXTRACT", "MONTH", "o_orderdate").cast("long").alias("o_month"),
        fn("EXTRACT", "DAY", "o_orderdate").cast("long").alias("o_day"),
        fn("EXTRACT", "QUARTER", "o_orderdate").cast("long").alias("o_quarter"),
        fn("FLOOR_TO", "o_orderdate", "month").alias("month_start"),
        fn("FLOOR_TO", "o_orderdate", "year").alias("year_start"),
        fn("TIMESTAMP_ADD", "DAY", F.lit(30), "o_orderdate").alias("due_date"),
        fn("TIMESTAMP_ADD", "MONTH", F.lit(2), "o_orderdate").alias("review_date"),
    )


@register(
    "fn_conditional_suite",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
           (c_acctbal BETWEEN 0 AND 1000)    AS is_small,
           (c_mktsegment IN ('MACHINERY', 'AUTOMOBILE')) AS is_industrial,
           (c_nationkey IS NOT DISTINCT FROM 3) AS is_nation3
    FROM customer
    """,
    tags=("functions",),
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/NULLIF/COALESCE/BETWEEN/IN/IS [NOT] DISTINCT FROM
    (FunctionCatalog.scala:281–352)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        fn("COALESCE", fn("NULLIF", "c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg_or_default"
        ),
        fn("BETWEEN", "c_acctbal", F.lit(0), F.lit(1000)).alias("is_small"),
        fn("IN", "c_mktsegment", "MACHINERY", "AUTOMOBILE").alias("is_industrial"),
        fn("IS_NOT_DISTINCT_FROM", "c_nationkey", F.lit(3)).alias("is_nation3"),
    )


@register(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("functions", "superset"),
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access — a documented superset (SURVEY §2.8: absent in the 1.4
    reference catalog, free in Spark)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@register(
    "fn_array_suite",
    oracle="""
    SELECT vec_id,
           len(embedding)                          AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)  AS first_val,
           round(CAST(embedding[64] AS DOUBLE), 6) AS last_val,
           round(CAST(list_sum(embedding) AS DOUBLE), 5) AS vec_sum
    FROM embeddings WHERE vec_id < 100
    """,
    tags=("functions",),
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY/CARDINALITY/ITEM/ELEMENT (FunctionCatalog.scala:241–247,332–337).
    list_sum in DuckDB sums floats sequentially; Spark's aggregate() does the
    same fold order over the array, in double — rounded to absorb the
    float32-accumulation difference."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    vec = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        fn("CARDINALITY", "embedding").alias("dim"),
        F.round(fn("ITEM", vec, 1), 6).alias("first_val"),
        F.round(fn("ITEM", vec, 64), 6).alias("last_val"),
        F.round(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 5).alias("vec_sum"),
    )


@register(
    "fn_cast_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT)   AS price_floor_int,
           CAST(o_orderkey AS VARCHAR)           AS key_str,
           CAST(o_orderkey AS DOUBLE)            AS key_dbl,
           CAST(o_orderdate AS DATE)             AS order_day,
           (CAST(o_orderkey AS SMALLINT) = o_orderkey) AS fits_short
    FROM orders WHERE o_orderkey < 1000
    """,
    tags=("functions",),
)
def fn_cast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST across the §1.3 type lattice. Double→int goes through FLOOR
    because bare CAST semantics differ (Spark truncates, DuckDB rounds) —
    the engine keeps Spark/Java truncation and documents the deviation."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return orders.select(
        "o_orderkey",
        fn("CAST", fn("FLOOR", "o_totalprice"), "long").alias("price_floor_int"),
        fn("CAST", "o_orderkey", "string").alias("key_str"),
        fn("CAST", "o_orderkey", "double").alias("key_dbl"),
        fn("CAST", "o_orderdate", "date").alias("order_day"),
        (fn("CAST", "o_orderkey", "short") == F.col("o_orderkey")).alias("fits_short"),
    )
