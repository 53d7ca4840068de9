"""Set operations.

Reference: DataSet.union (bag semantics, DataSet.java:1241);
Table.union/unionAll/intersect/intersectAll/minus/minusAll
(/root/reference/flink-libraries/flink-table/src/main/scala/org/apache/
flink/table/api/table.scala:561–673); the reference implements
intersect/minus with a coGroup (DataSetIntersect.scala:37) — Spark plans
these natively as left-semi/anti joins with aggregated duplicates, which
is the same shuffle shape minus the custom operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag union (DataSet.union / Table.unionAll). By-position, like the
    reference (schema must match)."""
    return a.unionAll(b)


def union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set union (Table.union, table.scala:608) = bag union + duplicate
    elimination (one shuffle for the distinct)."""
    return a.union(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def minus(a: DataFrame, b: DataFrame) -> DataFrame:
    """Table.minus (set difference)."""
    return a.subtract(b)


def minus_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Table.minusAll (bag difference)."""
    return a.exceptAll(b)
