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
- Q2/Q11/Q20 (r12) run on a DERIVED stand-in partsupp (4 suppliers per
  part by a rotation stride, integer-hash quantities/costs in exact
  cents) built in-query from part × supplier on BOTH engines — the
  text_decontaminate doc_id%97 convention; see derived_partsupp/_PS_CTE.
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


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q11 / Q20 — the three queries the driver schema previously
# blocked (no partsupp table). Closed with an IN-QUERY stand-in: partsupp is
# DERIVED deterministically from the driver's own part × supplier tables by
# the same convention text_decontaminate uses for its eval split (doc_id %
# 97 — a stand-in benchmark set). Each part gets 4 distinct suppliers by a
# rotation stride (dbgen's PS_SUPPKEY construction, dbgen/build.c: suppkey =
# (partkey + i·(S/4 + …)) mod S — simplified to a guaranteed-distinct
# stride), and availqty/supplycost are integer hashes of the pair. Both
# engines derive the SAME rows from the SAME parquet inputs, so the oracles
# validate the full query logic over it. supplycost is carried as integer
# CENTS end-to-end (sums and thresholds stay integer-exact; the /100.0
# happens once per output row).

_PS_CTE = """
    sc AS (SELECT count(*) AS s_cnt FROM supplier),
    ps0 AS (SELECT p_partkey AS ps_partkey,
                   (p_partkey + i.i * greatest(s_cnt // 4, 1)) % s_cnt AS ps_suppkey
            FROM part, sc, (SELECT unnest([0, 1, 2, 3]) AS i) i),
    ps AS (SELECT ps_partkey, ps_suppkey,
                  (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
                  (ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100 AS ps_cost_cents
           FROM ps0)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stand-in partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    ps_cost_cents), 4 distinct suppliers per part via a rotation stride of
    max(S//4, 1) (strides 0/q/2q/3q with 3q < S, so the four keys never
    collide), quantities/costs as integer hashes of the pair. One
    broadcast of the 1-row supplier count; the frame is 4×|part| rows and
    never shuffles on construction. Mirrors _PS_CTE exactly."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    s_cnt = _t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s_cnt"))
    ps0 = (
        part.crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            "s_cnt",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr("(p_partkey + i * greatest(s_cnt div 4, 1)) % s_cnt").alias(
                "ps_suppkey"
            ),
        )
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999 + 1).alias(
            "ps_availqty"
        ),
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 100000 + 100).alias(
            "ps_cost_cents"
        ),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_CTE},
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    j AS (
      SELECT p.p_partkey, p.p_brand, p.p_type,
             eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name,
             ps.ps_cost_cents,
             min(ps.ps_cost_cents) OVER (PARTITION BY p.p_partkey) AS mn
      FROM part p JOIN ps ON p.p_partkey = ps.ps_partkey
                  JOIN eu ON ps.ps_suppkey = eu.s_suppkey
      WHERE p.p_type = 'STANDARD' AND p.p_size >= 25)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           s_suppkey, ps_cost_cents / 100.0 AS ps_supplycost
    FROM j WHERE ps_cost_cents = mn
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
    tags=("tpch", "join", "window", "partsupp"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for STANDARD parts of size
    >= 25, the EUROPE supplier(s) offering the per-part minimum supply
    cost, top 100 by account balance. The correlated min-subquery becomes
    a per-part window MIN over the region-filtered join — one shuffle on
    p_partkey instead of a re-scan per part (the classic Spark rewrite;
    Catalyst plans the original correlated form as this join anyway).
    Adaptations: partsupp is the derived stand-in; p_type equality (the
    driver's types are single words, dbgen's '%BRASS' suffix has no
    analogue); s_suppkey added to the output for a fully deterministic
    top-100 tie-break (no s_address/s_phone/s_comment in the schema)."""
    from pyspark.sql.window import Window

    ps = derived_partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 25)
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = (
        part.join(ps, F.col("p_partkey") == F.col("ps_partkey"))
        .join(eu, F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "mn", F.min("ps_cost_cents").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        j.filter(F.col("ps_cost_cents") == F.col("mn"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "s_suppkey",
            (F.col("ps_cost_cents") / 100.0).alias("ps_supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PS_CTE},
    j AS (
      SELECT ps_partkey, ps_cost_cents * ps_availqty AS v_cents
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
      WHERE s_nationkey % 5 = 2),
    g AS (SELECT ps_partkey, CAST(sum(v_cents) AS BIGINT) AS value_cents
          FROM j GROUP BY ps_partkey)
    SELECT ps_partkey, value_cents, value_cents / 100.0 AS value
    FROM (SELECT ps_partkey, value_cents,
                 CAST(sum(value_cents) OVER () AS BIGINT) AS total_cents,
                 CAST(count(*) OVER () AS BIGINT) AS n_parts
          FROM g)
    WHERE value_cents * n_parts > 2 * total_cents
    """,
    tags=("tpch", "agg", "having", "partsupp"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part total
    stock value held by a supplier cohort, keeping parts whose value
    exceeds twice the mean per-part share. Adaptations: the cohort is the
    deterministic s_nationkey % 5 = 2 fifth (a single named nation can be
    supplier-EMPTY at the smallest SF — the driver spreads ~10 suppliers
    over 25 synthetic nations), and dbgen's fixed FRACTION becomes the
    scale-free 2x-mean cut (a fixed share threshold is all-pass at small
    part counts and all-fail at large ones; 2x-mean selects a stable
    minority at every SF). The global total AND part count come from a
    1-ROW aggregate of the grouped frame, broadcast-crossJoined back —
    NOT an unpartitioned window: the grouped frame is PARTS-cardinality
    (~10^10 rows at the 100 TB design point) and `sum(...) OVER ()` would
    sort it in a single task (the reference's own discipline for this
    shape is the broadcast single-row join, DataSetSingleRowJoin.scala:42,
    broadcast at :98-115). The grouped frame is eagerly localCheckpoint-ed
    so the partsupp join is scanned once for both consumers — Catalyst
    prunes the two branches' columns independently, so ReusedExchange
    cannot be relied on (the scalar-subquery form would likewise re-run
    the join). Values are integer cents throughout; the threshold compare
    is value_cents * n_parts > 2 * total_cents — exact integers on both
    engines, no float in the decision."""
    ps = derived_partsupp(spark, sf_dir)
    cohort = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") % 5 == 2)
    j = (
        ps.join(cohort, F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("ps_partkey", (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v_cents"))
    )
    g = (
        j.groupBy("ps_partkey")
        .agg(F.sum("v_cents").alias("value_cents"))
        .localCheckpoint(eager=True)
    )
    totals = g.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        g.crossJoin(F.broadcast(totals))
        .filter(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select(
            "ps_partkey", "value_cents",
            (F.col("value_cents") / 100.0).alias("value"),
        )
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PS_CTE},
    agg AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2),
    qualified AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps JOIN part ON ps.ps_partkey = p_partkey AND p_name LIKE 'small%'
              JOIN agg ON agg.l_partkey = ps.ps_partkey
                      AND agg.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * agg.qty)
    SELECT s_suppkey, s_name
    FROM supplier JOIN qualified ON s_suppkey = ps_suppkey
    """,
    tags=("tpch", "join", "semi", "partsupp"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers holding
    excess stock (availqty > half of what they shipped in 1997) of
    'small%' parts. The correlated quantity subquery becomes a pre-
    aggregated (partkey, suppkey) frame joined into partsupp — lineitem
    is scanned once with the year filter pushed to the scan, and the
    final supplier attach is a semi-shaped DISTINCT join. Adaptation:
    the nation cut is dropped (the driver's synthetic 25-nation split
    would empty the result at the smallest SF; the semi-join chain is
    the operator under test)."""
    ps = derived_partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    agg = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    small = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    qualified = (
        ps.join(small, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            agg,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_suppkey", "s_name")
    )
