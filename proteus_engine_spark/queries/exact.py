"""Exact-arithmetic helpers for cross-engine (Spark vs DuckDB) hash-stable
aggregates.

Floating-point SUM is order-dependent; Spark and DuckDB will aggregate in
different orders, so a naive ``sum(double)`` hash-mismatches the oracle in
the last ulps. The driver tables store money columns as DOUBLE but their
values carry ≤2 decimal digits, so casting to DECIMAL is lossless; DECIMAL
aggregation is exact and therefore order-independent; a final cast to
DOUBLE is deterministic (round-to-nearest of the same exact value in both
engines). The same discipline the reference gets from per-type serializers
(everything is exact bytes), recovered on the SQL level.

Each helper returns a pyspark Column; the mirrored SQL snippets live inline
in the oracle strings, e.g. ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM over a ≤`scale`-decimal-digit double column."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double.

    SQL mirror: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") / F.count(c)).alias(alias)


def revenue(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Exact per-row revenue term: decimal price × decimal (1 - discount).

    SQL mirror: CAST(price AS DECIMAL(18,2)) * (1 - CAST(disc AS DECIMAL(18,2)))
    """
    return dec(price) * (F.lit(1) - dec(disc))


def sum_revenue(alias: str = "revenue", price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """SQL mirror: CAST(SUM(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))) AS DOUBLE)"""
    return F.sum(revenue(price, disc)).cast("double").alias(alias)


# SQL-side building blocks (kept next to the Column builders so the two
# stay in sync; oracle strings interpolate these).
SQL_DSUM = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col})"
SQL_REVENUE = "CAST({p} AS DECIMAL(18,2)) * (1 - CAST({d} AS DECIMAL(18,2)))"
SQL_SUM_REVENUE = "CAST(SUM(CAST({p} AS DECIMAL(18,2)) * (1 - CAST({d} AS DECIMAL(18,2)))) AS DOUBLE)"
