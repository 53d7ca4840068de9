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


def chained_window_sessions(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    watermark: str,
    bucket: str,
    gap: str,
    bucket_aggs: list[Column],
    session_aggs: list[Column],
) -> DataFrame:
    """CHAINED stateful window aggregation in ONE streaming query: a
    keyed tumbling-window aggregate whose finalized windows feed a
    SESSION-window aggregate downstream — multiple stateful operators
    per query, the composition the reference expresses by chaining
    WindowedStream operators (DataStreamGroupWindowAggregate outputs
    re-windowed by a second window assigner) and Spark supports natively
    for time-window aggregations since 3.5 (the window struct carries
    event time, so the session assigner consumes the tumble output with
    correct watermark propagation — no re-declared watermark, no late
    rows by construction).

    Why the second stage is windows-on-windows and not CEP-on-windows:
    a flatMapGroupsWithState/applyInPandasWithState operator emits rows
    only once the watermark has CONFIRMED them — every emitted row is
    already older than the watermark, so any downstream stateful
    operator would drop it as late. Spark's multi-stateful correctness
    check rejects that plan outright (verified empirically); chaining is
    sound exactly for the operators whose emission Spark can reason
    about — time-window aggregates — which is what this composes.

    Semantics: with bucket=1h and gap=90min, a session is a maximal run
    of CONSECUTIVE active hourly buckets per key (each finalized bucket
    carries event time bucket_end − 1µs, so two adjacent buckets are
    1h < gap apart and merge; one silent hour makes 2h > gap and
    splits). ``bucket_aggs`` aggregate events into buckets,
    ``session_aggs`` aggregate bucket rows into sessions. Emits
    (key_col, session_start, session_end, *session_aggs) where
    session_start/session_end are the session-window struct bounds —
    note the − 1µs anchoring: epoch_ms(session_start) + 1 is the first
    bucket's end, epoch_ms(session_end) + 1 the last bucket's end + gap.
    A session finalizes when the watermark passes its end; sessions
    still open at end of input stay pending (append-mode semantics).

    Scale shape: both stages are keyed streaming aggregates with
    map-side partial state; stage-2 state is bounded by active sessions
    per key, stage-1 by open buckets within the watermark."""
    hourly = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.window(ts_col, bucket).alias("w"))
        .agg(*bucket_aggs)
    )
    return (
        hourly.groupBy(F.col(key_col), F.session_window(F.col("w"), gap).alias("s"))
        .agg(*session_aggs)
        .withColumn("session_start", F.col("s.start"))
        .withColumn("session_end", F.col("s.end"))
        .drop("s")
    )


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
