"""Relational query suite: TPC-H anchors + one oracle-checked query per
relational operator family from SURVEY.md §2.2–2.7.

Reference anchors: TPCHQuery3.java:86 and TPCHQuery10.java in
/root/reference/flink-examples/flink-examples-batch/src/main/java/org/
apache/flink/examples/java/relational/; the operator families map to
DataSet.java (joins :751–1118, aggs :339–486, setops :1241, sort :1401) and
table.scala (:116–798).

Every query here is built with the engine's operator modules /
DataFrame API and carries a DuckDB oracle using the exact-decimal
discipline from queries.exact (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from proteus_engine_spark.operators import joins as J
from proteus_engine_spark.operators import setops as S
from proteus_engine_spark.operators import sort as SRT
from proteus_engine_spark.operators.aggregates import max_by, min_by, sum0
from proteus_engine_spark.queries.exact import davg, dec, dsum, revenue, sum_revenue
from proteus_engine_spark.queries.registry import register
from proteus_engine_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# TPC-H anchors
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                          AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           SUM(l_quantity) / COUNT(l_quantity)                      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan group aggregate — the canonical partial-agg
    benchmark; at 100 TB this is scan-bound with a tiny shuffle (6 groups)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(revenue()).cast("double").alias("sum_disc_price"),
            F.sum(revenue() * (F.lit(1) + dec("l_tax"))).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "bench", "flagship"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (reference anchor TPCHQuery3.java:86): filter → join ×2 →
    group-agg → top-k. Customer side is small relative to lineitem at every
    SF → broadcast it into orders, shuffle only the filtered fact rows;
    TakeOrderedAndProject avoids a global sort."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    # No forced broadcast: the filtered customer side broadcasts via
    # Catalyst size stats at test SFs, and at 100 TB (where customer is
    # too big to broadcast) AQE falls back to a shuffled join — same code.
    return (
        J.join(orders, cust, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_revenue("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 0) AS DOUBLE) AS promo_revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
    tags=("tpch", "filter", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global agg — tests predicate pushdown to the
    parquet scan (no shuffle at all beyond the final 1-row reduce)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.08))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            sum0(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("tpch", "join", "bench"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Dimensions (region/nation/supplier) are
    broadcast; the only real shuffle is lineitem⋈orders and the customer
    equi-condition rides along (c_nationkey = s_nationkey is a residual
    filter after the broadcast joins)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # Only region/nation are forced broadcasts (fixed-size at every SF);
    # supplier/customer grow with SF — Catalyst stats + AQE pick their
    # strategy, so the same plan code survives a 100 TB input.
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum_revenue("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "bench"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (reference anchor TPCHQuery10.java): 4-way join →
    group-agg → top-20."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_revenue("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("tpch", "join", "case"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast part into a filtered lineitem scan +
    conditional aggregation (CASE inside SUM)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = revenue()
    # part grows with SF — no forced broadcast; stats/AQE decide.
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)")))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice, sum_qty
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             SUM(l_quantity) AS sum_qty
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
      GROUP BY o_custkey, o_orderkey, o_orderdate, o_totalprice
      HAVING SUM(l_quantity) > 150
    ) big, customer
    WHERE big.o_custkey = c_custkey
    ORDER BY sum_qty DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "having", "join"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate + HAVING + join back to dimension, top-k."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    big = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Join family (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "join_inner_dims",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer, nation, region
    WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
    """,
    tags=("join",),
)
def join_inner_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain through broadcast dimensions (DataSet.join,
    DataSet.java:751; joinWithTiny :797)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        J.join_with_tiny(cust, nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """leftOuterJoin (DataSet.java:841): customers with no orders survive
    with NULL order columns → COUNT(col) skips them, SUM0 semantics."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        J.join(cust, orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spent"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < 0
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rightOuterJoin (DataSet.java:864)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        J.join(orders, cust, F.col("o_custkey") == F.col("c_custkey"), "right")
        .filter(F.col("c_acctbal") < 0)
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT k.key AS nationkey, k.n_cust, k.n_supp FROM (
      SELECT COALESCE(c.k, s.k) AS key, COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
      FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
      ON c.k = s.k
    ) k
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fullOuterJoin (DataSet.java:895) over pre-aggregated sides."""
    cust = _t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("ck")).agg(F.count(F.lit(1)).alias("n_cust"))
    supp = _t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("sk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        J.join(cust, supp, F.col("ck") == F.col("sk"), "full")
        .select(
            F.coalesce(F.col("ck"), F.col("sk")).alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join — the reference only reaches this via the IN/EXISTS rewrite
    (FlinkRuleSets.scala:36); exposed first-class as left_semi."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return J.join(cust, orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS rewrite in the reference) as left_anti."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return J.join(cust, orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (DataSet.cross, DataSet.java:1056) — broadcast
    nested-loop on the tiny side; never shuffle a cross at scale."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return J.cross(region, nation, broadcast_right=True).select("r_name", "n_name")


@register(
    "join_single_row",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_above_avg
    FROM lineitem, (SELECT SUM(l_quantity) / COUNT(l_quantity) AS avg_qty FROM lineitem) g
    WHERE l_quantity > g.avg_qty
    GROUP BY l_returnflag
    """,
    tags=("join", "subquery"),
)
def join_single_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSetSingleRowJoin parity (DataSetSingleRowJoin.scala:42): compare
    every row against a global scalar aggregate — broadcast the 1-row side."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.agg((F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"))
    return (
        J.single_row_join(li, avg_qty)
        .filter(F.col("l_quantity") > F.col("avg_qty"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@register(
    "join_theta",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_poorer_custs
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal < s_acctbal
    GROUP BY s_suppkey
    """,
    tags=("join",),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with theta residual (Table.join allows extra non-equi
    conjuncts, table.scala:326)."""
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    return (
        J.join(
            supp,
            cust,
            (F.col("s_nationkey") == F.col("c_nationkey")) & (F.col("c_acctbal") < F.col("s_acctbal")),
            "inner",
            hint=J.JoinHint.BROADCAST_HASH_FIRST,
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_poorer_custs"))
    )


@register(
    "cogroup_counts",
    oracle="""
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s ON c.k = s.k
    """,
    tags=("join", "udf"),
)
def cogroup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSet.coGroup (DataSet.java:1009) through the engine's co_group
    operator: per-key two-input pandas apply (Arrow-batched)."""
    import pandas as pd

    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("k"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("k"))

    def count_both(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = left["k"].iloc[0] if len(left) else right["k"].iloc[0]
        return pd.DataFrame({"nationkey": [int(key)], "n_cust": [len(left)], "n_supp": [len(right)]})

    return J.co_group(cust, supp, ["k"], ["k"], count_both, "nationkey int, n_cust long, n_supp long")


# ---------------------------------------------------------------------------
# Aggregation family (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "agg_basic",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSet.aggregate SUM/MIN/MAX (DataSet.java:339) + AVG/COUNT."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        davg("o_totalprice", "avg_price"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (AggregateExpandDistinctAggregatesRule in the
    reference, FlinkRuleSets.scala:92 — native in Spark)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_minby_maxby",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, round(o_totalprice * 100) * 1000000 + o_orderkey) AS biggest_order,
           arg_min(o_orderkey, round(o_totalprice * 100) * 1000000 + o_orderkey) AS smallest_order
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSet.minBy/maxBy (DataSet.java:523,559) via native max_by/min_by.
    The ordering value is de-tied with the unique key so both engines pick
    the same row (the reference's minBy is also deterministic-by-position)."""
    orders = _t(spark, sf_dir, "orders")
    ordv = F.round(F.col("o_totalprice") * 100) * 1000000 + F.col("o_orderkey")
    return orders.groupBy("o_orderstatus").agg(
        max_by("o_orderkey", ordv).alias("biggest_order"),
        min_by("o_orderkey", ordv).alias("smallest_order"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (DecomposeGroupingSetRule parity — single Expand pass
    in Spark, not N scans)."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs__")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        FROM __li_gs__
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.sum("l_quantity").alias("sum_qty"))


@register(
    "agg_stats_exact",
    oracle="""
    SELECT l_returnflag,
           COUNT(l_quantity) AS n,
           SUM(l_quantity) AS s1,
           SUM(l_quantity * l_quantity) AS s2,
           (SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(l_quantity)) / COUNT(l_quantity) AS var_pop_qty,
           (SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(l_quantity)) / (COUNT(l_quantity) - 1) AS var_samp_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAR_POP/VAR_SAMP/STDDEV parity (FunctionCatalog.scala:326–330) in the
    deterministic sum-of-squares form: l_quantity is integral so double sums
    are exact and order-independent; the variance arithmetic is then
    identical in both engines. (F.var_pop itself uses Welford — same math,
    but float path differs per engine; tests cover it separately.)"""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(q)
    s1 = F.sum(q)
    s2 = F.sum(q * q)
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        ((s2 - s1 * s1 / n) / n).alias("var_pop_qty"),
        ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("var_samp_qty"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) d
    GROUP BY c_nationkey
    """,
    tags=("agg",),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT aggregate (FunctionCatalog.scala:322 CollectAggFunction) →
    collect_list; emitted sorted+joined for cross-engine determinism."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.select("c_nationkey", "c_mktsegment")
        .distinct()
        .groupBy("c_nationkey")
        .agg(F.array_join(F.sort_array(F.collect_list("c_mktsegment")), ",").alias("segments"))
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 5)
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    tags=("agg",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSet.distinct (DataSet.java:596) / dropDuplicates."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select("c_nationkey", "c_mktsegment").dropDuplicates()


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


def _nk_pair(spark: SparkSession, sf_dir: str):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nk"))
    return cust, supp


@register(
    "setop_union_all",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL SELECT s_nationkey AS nk FROM supplier
    ) u GROUP BY nk
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (DataSet.union, DataSet.java:1241 / Table.unionAll)."""
    cust, supp = _nk_pair(spark, sf_dir)
    return S.union_all(cust, supp).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (Table.union, table.scala:608)."""
    cust, supp = _nk_pair(spark, sf_dir)
    return S.union(cust, supp)


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table.intersect (DataSetIntersect.scala:37 — coGroup there, semi-join
    + distinct here, same shuffle shape)."""
    cust, supp = _nk_pair(spark, sf_dir)
    return S.intersect(cust, supp)


@register(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _nk_pair(spark, sf_dir)
    return S.intersect_all(cust, supp)


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table.minus (table.scala:561)."""
    cust, supp = _nk_pair(spark, sf_dir)
    return S.minus(cust, supp)


@register(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table.minusAll (table.scala:586) — bag difference with multiplicity."""
    cust, supp = _nk_pair(spark, sf_dir)
    return S.minus_all(cust, supp)


# ---------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    tags=("sort",),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table.orderBy + offset/fetch (table.scala:733–798)."""
    orders = _t(spark, sf_dir, "orders")
    return SRT.offset_fetch(
        orders.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        offset=10,
        fetch=20,
    )


@register(
    "sort_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
    tags=("sort", "window"),
)
def sort_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped first(n) (UnsortedGrouping.java:202) as per-group top-k."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return SRT.top_k_per_group(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], k=3
    )


# ---------------------------------------------------------------------------
# OVER windows (SURVEY §2.5) — superset of the reference (batch OVER +
# ranking functions are absent in Flink 1.4).
# ---------------------------------------------------------------------------


@register(
    "over_running_agg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
           row_number() OVER w AS rn,
           COUNT(*) OVER w AS n_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def over_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream SQL OVER unbounded-preceding parity
    (DataStreamOverAggregate.scala:45, RowTimeUnboundedOver.scala) on batch:
    running aggregates per key in row order."""
    from proteus_engine_spark.operators.windows import over

    orders = _t(spark, sf_dir, "orders")
    w = over(
        partition_by=["o_custkey"],
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
        rows_between=(Window.unboundedPreceding, Window.currentRow),
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "over_bounded_rows",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last3,
           lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
           lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def over_bounded_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS-PRECEDING OVER (ProcTimeBoundedRowsOver.scala parity) +
    LAG/LEAD (superset — absent in the 1.4 FunctionCatalog)."""
    from proteus_engine_spark.operators.windows import over

    orders = _t(spark, sf_dir, "orders")
    base = over(partition_by=["o_custkey"], order_by=[F.col("o_orderdate"), F.col("o_orderkey")])
    w3 = over(
        partition_by=["o_custkey"],
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
        rows_between=(-2, Window.currentRow),
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w3).cast("double").alias("sum_last3"),
        F.lag("o_orderkey", 1).over(base).alias("prev_order"),
        F.lead("o_orderkey", 1).over(base).alias("next_order"),
    )


@register(
    "over_rank_functions",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def over_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking functions — a documented superset (SURVEY §2.5: absent in the
    reference's FunctionCatalog)."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# ---------------------------------------------------------------------------
# Subqueries (SURVEY §2.3 IN/EXISTS/scalar — Catalyst rewrites natively)
# ---------------------------------------------------------------------------


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
    tags=("subquery",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (SubQueryRemoveRule parity, FlinkRuleSets.scala:36) —
    expressed in SQL so Catalyst's RewritePredicateSubquery plans the
    left-semi join, mirroring the reference's rewrite path."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__orders_sq__")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__customer_sq__")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM __orders_sq__
        WHERE o_custkey IN (SELECT c_custkey FROM __customer_sq__ WHERE c_acctbal > 5000)
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    tags=("subquery",),
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (RelDecorrelator parity, BatchTableEnvironment.scala:333)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__cust_ex__")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__ord_ex__")
    return spark.sql(
        """
        SELECT c_custkey FROM __cust_ex__ c
        WHERE EXISTS (SELECT 1 FROM __ord_ex__ o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        """
    )


@register(
    "explode_unnest",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    GROUP BY token HAVING COUNT(*) >= 10
    """,
    tags=("udtf",),
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableFunction / UNNEST parity (LogicalUnnestRule, FlinkRuleSets.scala:121;
    DataSetCorrelate.scala:42): explode a split column — Spark plans a
    Generate node, the lateral-join equivalent."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
    )


@register(
    "agg_approx_distinct_bounds",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           true AS within_bounds
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "sketch"),
)
def agg_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct count, verdict-gated (the same
    bounds discipline as text_length_percentiles_approx): per group the
    engine computes BOTH approx_count_distinct(rsd=0.02) and the exact
    distinct, and emits within_bounds = |approx - exact| <= 0.1 * exact
    (5x the requested relative standard deviation — a bound the sketch
    violates with negligible probability). The oracle computes the exact
    count and asserts the verdict is uniformly true, so a broken sketch
    (or a mis-wired rsd) fails the hash while the approximate VALUE,
    which is engine-specific by nature, never has to match. At 100 TB
    the sketch is the point: a mergeable fixed-size state per group
    instead of a distinct-key shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact_distinct"),
        )
        .select(
            "o_orderpriority",
            "exact_distinct",
            (
                F.abs(F.col("approx") - F.col("exact_distinct"))
                <= 0.1 * F.col("exact_distinct")
            ).alias("within_bounds"),
        )
    )


@register(
    "agg_approx_distinct_merge",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_left,
           CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_right,
           true AS within_bounds
    FROM orders
    """,
    tags=("agg", "sketch"),
)
def agg_approx_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch MERGE gate — the merge member of the
    distinct-count arc (the agg_quantile_sketch_merge discipline applied
    to HLL): orders splits into two DISJOINT halves (o_orderkey parity),
    each half repartitioned to its own 4 partitions, then unioned —
    union concatenates partitions, so the single approx_count_distinct
    aggregate necessarily builds >= 4 per-half HLL register sets PER
    SIDE and merges them across the boundary (register-wise max, the
    exact mechanism a 1000-executor distinct count over 100 TB relies
    on). The verdict checks the MERGED estimate against the whole:
    |approx - exact| <= 0.1 * exact (5x the requested rsd=0.02, the
    agg_approx_distinct_bounds bound); a merge that dropped a side's
    registers undercounts far past it, double-counting cannot happen by
    construction (register max is idempotent — the property the gate
    certifies). n_left/n_right pin that the halves really partition the
    input. Duplicate custkeys ACROSS the halves are the point: the
    merged sketch must count them once."""
    o = _t(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderkey") % 2 == 0).repartition(4)
    right = o.filter(F.col("o_orderkey") % 2 == 1).repartition(4)
    u = left.unionByName(right)
    return u.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.sum((F.col("o_orderkey") % 2 == 0).cast("long")).alias("n_left"),
        F.sum((F.col("o_orderkey") % 2 == 1).cast("long")).alias("n_right"),
    ).select(
        "exact_distinct",
        "n_left",
        "n_right",
        (
            F.abs(F.col("approx") - F.col("exact_distinct"))
            <= 0.1 * F.col("exact_distinct")
        ).alias("within_bounds"),
    )
