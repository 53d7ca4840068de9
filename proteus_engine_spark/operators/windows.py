"""Group windows (TUMBLE/HOP/SESSION) and OVER windows, batch + stream.

Reference: window assigners (/root/reference/flink-streaming-java/src/main/
java/org/apache/flink/streaming/api/windowing/assigners/), batch group-window
aggregate (/root/reference/flink-libraries/flink-table/src/main/scala/org/
apache/flink/table/plan/nodes/dataset/DataSetWindowAggregate.scala:42),
stream OVER aggregates (DataStreamOverAggregate.scala:45), Table API Over
windows (/root/reference/flink-libraries/flink-table/src/main/scala/org/
apache/flink/table/api/scala/windows.scala:90).

Spark-first: `F.window` / `F.session_window` are window *expressions* — the
assignment happens inside a projection (no custom operator), then a plain
hash aggregate. Works identically on batch and streaming DataFrames, which
gives the reference's unified Table API semantics for free. OVER windows use
`pyspark.sql.Window` — a superset of the reference (Flink 1.4 has no batch
OVER and no ranking functions; SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def tumble(ts: str | Column, size: str) -> Column:
    """TUMBLE(ts, size) → struct<start,end>. Epoch-aligned, same as the
    reference's TumblingEventTimeWindows.assignWindows."""
    return F.window(ts, size)


def hop(ts: str | Column, size: str, slide: str) -> Column:
    """HOP(ts, slide, size): each row lands in size/slide windows — Spark
    explodes to the same window multiset as SlidingEventTimeWindows."""
    return F.window(ts, size, slide)


def session(ts: str | Column, gap: str) -> Column:
    """SESSION(ts, gap): merging windows (EventTimeSessionWindows). Spark's
    session_window merges inside the aggregate — one shuffle on
    (key, session), not the reference's per-record merge tree."""
    return F.session_window(ts, gap)


def tumble_agg(df: DataFrame, ts: str, size: str, keys: list[str], *aggs: Column) -> DataFrame:
    """Batch/stream tumbling group-window aggregate with window_start/end
    columns (TUMBLE_START/TUMBLE_END auxiliaries, FunctionCatalog.scala:405)."""
    return (
        df.groupBy(tumble(ts, size).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(df: DataFrame, ts: str, gap: str, keys: list[str], *aggs: Column) -> DataFrame:
    return (
        df.groupBy(session(ts, gap).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def over(
    partition_by: list[str | Column] | None = None,
    order_by: list[str | Column] | None = None,
    rows_between: tuple[int, int] | None = None,
    range_between: tuple[int, int] | None = None,
) -> WindowSpec:
    """Table API Over window builder (windows.scala:90; OverWindow
    api/windows.scala:29). `preceding/following` map to rows/range bounds;
    UNBOUNDED → Window.unboundedPreceding/Following."""
    spec = Window.partitionBy(*(partition_by or []))
    if order_by:
        spec = spec.orderBy(*order_by)
    if rows_between is not None:
        spec = spec.rowsBetween(*rows_between)
    elif range_between is not None:
        spec = spec.rangeBetween(*range_between)
    return spec
