"""Extended TPC-H coverage: the remaining queries of the classic suite that
are expressible over the driver's reduced schemas.

The reference ships TPC-H Q3/Q10 as examples (TPCHQuery3.java:86,
TPCHQuery10.java in /root/reference/flink-examples/flink-examples-batch/);
the rest of the suite exercises the same operator inventory (SURVEY.md
§2.2–2.7) in harder shapes: correlated/scalar subqueries, disjunctive scan
predicates, double aggregation, anti-join opportunity analysis.

Adaptations forced by the driver schema (no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone/p_container):
- Q4/Q21 "late" = l_shipdate > o_orderdate (instead of receipt vs commit).
- Q9 supply cost proxy = p_retailprice × l_quantity (no ps_supplycost).
- Q12 groups by l_returnflag (no l_shipmode).
- Q16 counts suppliers via lineitem (no partsupp).
- Q22 country code = c_nationkey (no phone prefix).
Every query keeps the original's plan shape and carries a DuckDB oracle
with the exact-decimal discipline from queries.exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proteus_engine_spark.operators import joins as J
from proteus_engine_spark.queries.exact import dec, dsum, revenue, sum_revenue
from proteus_engine_spark.queries.registry import register
from proteus_engine_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _view(spark: SparkSession, sf_dir: str, name: str, alias: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(alias)


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "join", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi residual
    (l_shipdate > o_orderdate), then a tiny group-agg. The semi join
    shuffles only orderkeys; lineitem is pre-projected to two columns."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        J.join(
            orders,
            li,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by year. The two
    nation lookups are broadcast; the disjunctive pair predicate is applied
    after them so it prunes before the fact-side shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(sum_revenue("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey AND r_name = 'AFRICA'
      AND s_nationkey = n2.n_nationkey AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "case"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: 8-way join + conditional share-of-total aggregation.
    NATION_5's share of ECONOMY-part revenue sold into AFRICA, by order
    year. Share = ratio of two exact decimal sums (cast to double after)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    rev = revenue()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS INTEGER)) AS DOUBLE) AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey AND p_type = 'STANDARD'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year. Supply cost
    proxy = p_retailprice × l_quantity (driver schema has no partsupp);
    all arithmetic stays in exact decimals until the final double cast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit = revenue() - dec("p_retailprice") * F.col("l_quantity").cast("int")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q12_ship_priority_class",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("tpch", "join", "case"),
)
def q12_ship_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-bucketed counting (grouped by
    l_returnflag — the driver schema has no l_shipmode)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join with an ON-clause filter + double
    aggregation (count per customer, then histogram of counts). The second
    aggregate's input is one row per customer — tiny shuffle."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        J.join(cust, orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, rev
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "join", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar-subquery max
    (DataSetSingleRowJoin parity — the 1-row max side is broadcast).
    total_revenue is exact-decimal-derived, so the double equality is
    deterministic in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(sum_revenue("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 25)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "agg"),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count of suppliers per part class (via
    lineitem — the driver schema has no partsupp). Filters push to the part
    scan; COUNT(DISTINCT) expands to a two-stage aggregate."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 25))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * (SUM(l_quantity) / COUNT(l_quantity))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    tags=("tpch", "join", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part average quantity),
    expressed decorrelated — pre-aggregate per partkey, broadcast-join, then
    filter. l_quantity is integral so the double avg is exact and the
    threshold comparison is deterministic in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count("l_quantity"))).alias("qty_threshold")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
    """,
    tags=("tpch", "join", "filter"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-attribute predicates across both join
    sides. The part-only conjuncts (brand OR-chain) are pushable to the
    part scan; the mixed part×lineitem terms evaluate post-join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(sum_revenue("revenue"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "join", "subquery"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the sole late shipper in multi-supplier finished orders
    ("late" = shipped after the order date; no receipt/commit dates in the
    driver schema). Correlated EXISTS + NOT EXISTS — expressed in SQL so
    Catalyst's RewritePredicateSubquery plans the left-semi and left-anti
    joins, mirroring the reference's SubQueryRemoveRule path
    (FlinkRuleSets.scala:36)."""
    _view(spark, sf_dir, "supplier", "__q21_supplier__")
    _view(spark, sf_dir, "lineitem", "__q21_lineitem__")
    _view(spark, sf_dir, "orders", "__q21_orders__")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM __q21_supplier__, __q21_lineitem__ l1, __q21_orders__
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
          AND EXISTS (SELECT 1 FROM __q21_lineitem__ l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM __q21_lineitem__ l3
                          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )


@register(
    "q22_sales_opportunity",
    oracle="""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
                       FROM customer
                       WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("tpch", "join", "subquery"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no high-value order, by
    country code (c_nationkey — the driver schema has no phone column; the
    anti-join side is orders > 450k because every synthetic customer has
    orders). Scalar-subquery average (exact-decimal derived) + anti join:
    the 1-row average broadcasts, the anti join shuffles only custkeys."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    orders = (
        _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000).select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "iter_connected_components",
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT o_custkey + 1000000 AS src, l_partkey AS dst
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey AND l_partkey < 50
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
    ),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
    nodes AS (SELECT DISTINCT src AS vertex FROM sym),
    reach(vertex, comp) AS (
      SELECT vertex, vertex FROM nodes
      UNION
      SELECT s.dst, r.comp FROM reach r JOIN sym s ON r.vertex = s.src
      WHERE r.comp < s.dst
    )
    SELECT vertex, MIN(comp) AS component FROM reach GROUP BY vertex
    """,
    tags=("iteration",),
)
def iter_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk-iteration parity (DataSet.iterate, DataSet.java:1156; Gelly
    ConnectedComponents example): label-propagation connected components on
    the customer↔part co-purchase bipartite graph (January 1997, partkeys
    < 50; customer node ids offset by 1e6). Driver-side loop with per-step
    lineage truncation + convergence probe; the oracle is a recursive CTE
    propagating minimum labels."""
    from proteus_engine_spark.operators.iterations import connected_components

    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 50)
    edges = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") + 1000000).alias("src"),
            F.col("l_partkey").alias("dst"),
        )
        .distinct()
    )
    return connected_components(edges).select("vertex", "component")


@register(
    "iter_delta_sssp",
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT o_custkey + 1000000 AS src, l_partkey AS dst
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey AND l_partkey < 30
    ),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
    paths(vertex, dist) AS (
      SELECT CAST(1 AS BIGINT) AS vertex, CAST(0 AS BIGINT) AS dist
      UNION
      SELECT s.dst, p.dist + 1 FROM paths p JOIN sym s ON p.vertex = s.src
      WHERE p.dist < 20
    )
    SELECT vertex, MIN(dist) AS dist FROM paths GROUP BY vertex
    """,
    tags=("iteration",),
)
def iter_delta_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-iteration parity (DataSet.iterateDelta, DataSet.java:1206):
    single-source shortest hop-distance from part vertex 1 over the
    customer↔part co-purchase graph (partkeys < 30, all dates — partkey 1
    has edges at every test SF, so the BFS actually expands). The
    WORKSET holds only vertices whose distance improved last round (the
    frontier), so each step's join touches the frontier, not the whole
    solution — the reference's worklist semantics, which is exactly what
    makes delta iteration cheaper than bulk at scale. Terminates when the
    frontier empties. Oracle: recursive-CTE BFS with a hop cap well above
    the graph's diameter."""
    from proteus_engine_spark.operators.iterations import iterate_delta

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 30)
    edges = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") + 1000000).cast("long").alias("src"),
            F.col("l_partkey").cast("long").alias("dst"),
        )
        .distinct()
    )
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = (
        sym.select(F.col("src").alias("vertex"))
        .union(sym.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    root = spark.range(1).select(
        F.lit(1).cast("long").alias("vertex"), F.lit(0).cast("long").alias("dist")
    )
    # NULL dist = unreached (the reference seeds the solution set the same
    # way); the root row is unioned explicitly so an isolated root still
    # yields {(1, 0)} like the oracle's CTE seed.
    solution = root.unionByName(
        nodes.filter(F.col("vertex") != 1).select(
            "vertex", F.lit(None).cast("long").alias("dist")
        )
    )

    def step(sol: DataFrame, work: DataFrame, _i: int):
        cand = sym.join(work, F.col("src") == F.col("vertex")).select(
            F.col("dst").alias("vertex"), (F.col("dist") + 1).alias("cand")
        )
        min_cand = cand.groupBy("vertex").agg(F.min("cand").alias("cand"))
        improved = (
            sol.join(min_cand, "vertex")
            .filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("vertex", F.col("cand").alias("dist"))
        )
        new_sol = (
            sol.join(improved.withColumnRenamed("dist", "new_d"), "vertex", "left")
            .select("vertex", F.coalesce("new_d", "dist").alias("dist"))
        )
        return new_sol, improved

    sol = iterate_delta(solution, root, step, max_iterations=20)
    return sol.filter(F.col("dist").isNotNull()).select("vertex", "dist")


@register(
    "join_salted_skew",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 0
    GROUP BY o_orderstatus
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual skew-salted equi-join (ShipStrategyType.PARTITION_HASH with a
    hot key — the case AQE's skew split can't always reach): the hot side
    spreads across 16 salt sub-partitions, the build side replicates per
    salt. Result is row-identical to the plain join (oracle-checked)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    joined = J.salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=16, how="inner")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@register(
    "agg_reduce_group_sorted",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS top3_total,
           arg_max(o_orderkey, round(o_totalprice * 100) * 1000000 + o_orderkey) AS top_order
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    GROUP BY o_orderstatus
    """,
    tags=("agg", "udf"),
)
def agg_reduce_group_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortGroup + reduceGroup parity (UnsortedGrouping.java:271,164):
    arbitrary per-group pandas transform over a sorted group — here the
    top-3-by-price total per order status. One shuffle on the key,
    Arrow-batched group delivery; the sort happens worker-side."""
    import pandas as pd

    from proteus_engine_spark.operators.aggregates import reduce_group

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )

    def top3(pdf: pd.DataFrame) -> pd.DataFrame:
        # group arrives sorted ascending by (price, orderkey) → top-3 = tail
        top = pdf.tail(3)
        total = float(
            (top["o_totalprice"] * 100).round().astype("int64").sum()
        ) / 100.0
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "top3_total": [total],
                "top_order": [int(top["o_orderkey"].iloc[-1])],
            }
        )

    return reduce_group(
        orders,
        ["o_orderstatus"],
        top3,
        "o_orderstatus string, top3_total double, top_order long",
        sort_within=["o_totalprice", "o_orderkey"],
    )
