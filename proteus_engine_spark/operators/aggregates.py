"""Aggregation surface.

Reference: DataSet.aggregate/sum/min/max/reduce/reduceGroup/minBy/maxBy
(/root/reference/flink-java/src/main/java/org/apache/flink/api/java/
DataSet.java:339,443,523,559), SQL aggregate functions incl. SUM0 and the
*WithRetract variants (/root/reference/flink-libraries/flink-table/src/main/
scala/org/apache/flink/table/validate/FunctionCatalog.scala:320–330),
GROUPING SETS / CUBE / ROLLUP via DecomposeGroupingSetRule
(/root/reference/flink-libraries/flink-table/src/main/scala/org/apache/
flink/table/plan/rules/logical/DecomposeGroupingSetRule.scala).

Spark-first: partial (map-side) aggregation, the reference's combiner
strategy (DataSetAggregate.scala:102–148), is automatic in Spark's
HashAggregateExec — every groupBy below compiles to
partial_agg → shuffle-by-key → final_agg, so a 100 TB input shuffles only
the aggregated partials. Retraction (*WithRetract) is subsumed by
Structured Streaming output modes — state is managed by the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, GroupedData
from pyspark.sql import functions as F


def sum0(col: str | Column) -> Column:
    """SUM0 parity (FunctionCatalog.scala:321 / Sum0AggFunction): SUM that
    returns 0 instead of NULL on empty/all-null input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.sum(c), F.lit(0))


def min_by(value: str | Column, ordering: str | Column) -> Column:
    """DataSet.minBy parity (DataSet.java:523): value of `value` on the row
    minimizing `ordering` (native JVM expression, no shuffle beyond the agg)."""
    v = F.col(value) if isinstance(value, str) else value
    o = F.col(ordering) if isinstance(ordering, str) else ordering
    return F.min_by(v, o)


def max_by(value: str | Column, ordering: str | Column) -> Column:
    """DataSet.maxBy parity (DataSet.java:559)."""
    v = F.col(value) if isinstance(value, str) else value
    o = F.col(ordering) if isinstance(ordering, str) else ordering
    return F.max_by(v, o)


def grouping_sets(df: DataFrame, sets: list[list[str]], *aggs: Column) -> DataFrame:
    """GROUPING SETS parity. Spark exposes grouping sets through SQL and
    through cube/rollup; the general form goes through a SQL fragment so
    Catalyst plans a single Expand node (one pass over the input — same
    plan shape the reference's DecomposeGroupingSetRule produces, but
    without N scans)."""
    all_cols = sorted({c for s in sets for c in s})
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    view = "__gs_input__"
    df.createOrReplaceTempView(view)
    agg_sql = ", ".join(a._jc.toString() if hasattr(a, "_jc") else str(a) for a in aggs)
    return df.sparkSession.sql(
        f"SELECT {', '.join(all_cols)}, {agg_sql} FROM {view} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def reduce_group(df: DataFrame, keys: list[str], func, schema, sort_within: list[str] | None = None) -> DataFrame:
    """DataSet.groupBy(...).reduceGroup / sortGroup+reduceGroup parity
    (UnsortedGrouping.java:164,271): arbitrary per-group transform.

    Spark-first: `applyInPandas` — one shuffle on the keys, Arrow-batched
    group delivery. ``sort_within`` emulates sortGroup by sorting the pandas
    frame inside the worker (cheap: group fits in memory by the same
    assumption the reference makes).
    """

    def wrapped(pdf):
        if sort_within:
            pdf = pdf.sort_values(sort_within, kind="mergesort")
        return func(pdf)

    return df.groupBy(*keys).applyInPandas(wrapped, schema=schema)


def agg_with_combiner_note(grouped: GroupedData, *aggs: Column) -> DataFrame:
    """Thin alias for groupBy().agg(): documents that Spark always applies
    the partial-aggregation (combiner) strategy of DataSetAggregate.scala:102."""
    return grouped.agg(*aggs)
