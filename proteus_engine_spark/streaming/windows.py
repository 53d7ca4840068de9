"""Streaming windowed aggregation and interval joins.

Reference: DataStreamGroupWindowAggregate.scala:48 (windowed group-agg),
DataStreamGroupAggregate.scala:49 (unbounded continuous agg with
retraction), DataStreamWindowJoin.scala:45 (time-bounded interval join).

Spark-first: identical groupBy(window(...)) expressions work on bounded and
unbounded frames; retraction (GroupAggProcessFunction.scala:39 retract
:123–154) is subsumed by output modes — `update` emits changed keys per
micro-batch, `complete` re-emits the table, `append` emits finalized
windows after the watermark. Interval joins are Structured Streaming
stream-stream joins with a time-range condition + watermarks, the direct
equivalent of RowTimeBoundedStreamInnerJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    watermark: str,
    window_size: str,
    keys: list[str],
    aggs: list[Column],
    slide: str | None = None,
    session_gap: str | None = None,
) -> DataFrame:
    """Tumbling / sliding / session windowed aggregate with watermark
    (WindowedStream.aggregate parity; incremental state management is
    Spark's, matching IncrementalAggregateFunction semantics)."""
    if session_gap is not None:
        win = F.session_window(ts_col, session_gap)
    elif slide is not None:
        win = F.window(ts_col, window_size, slide)
    else:
        win = F.window(ts_col, window_size)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def unbounded_agg(stream: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Continuous (non-windowed) group aggregate — the retracting unbounded
    agg of DataStreamGroupAggregate; run with outputMode update/complete."""
    return stream.groupBy(*keys).agg(*aggs)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    key_cond: Column,
    lower: str,
    upper: str,
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
) -> DataFrame:
    """Time-bounded inner join: r.ts ∈ [l.ts - lower, l.ts + upper]
    (DataStreamWindowJoin.scala:56–57 bounds). Watermarks bound state
    retention on both sides — without them a stream-stream join buffers
    forever (the same reason the reference cleans up per-key state with
    registered timers in RowTimeBoundedStreamInnerJoin)."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        key_cond
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner")
