"""Streaming sources.

Reference: StreamExecutionEnvironment sources (socketTextStream :1186,
readFile PROCESS_CONTINUOUSLY :991, fromElements :696, addSource :1391,
Kafka connectors in /root/reference/flink-connectors/) — mapped to
Structured Streaming's file/rate/kafka/socket sources.

For tests and oracle checks, the events parquet is replayed through the
file source: bounded input driven to completion with processAllAvailable(),
which makes streaming results deterministic and comparable to batch SQL —
the PySpark analogue of the reference's bounded ITCase streams
(StreamITCase pattern in flink-table tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def probe_parquet_schema(spark: SparkSession, path: str) -> T.StructType:
    """Footer-probe a parquet file's Spark-visible schema. If the file uses
    INT64 TIMESTAMP(NANOS) (which vanilla Spark rejects), fall back to the
    nanosAsLong legacy read — the conf mutation is scoped to the failure
    path, never applied when the data doesn't require it."""
    try:
        return spark.read.parquet(path).schema
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).schema


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as an unbounded stream (file source monitoring the
    parquet path — the senv.readFile(PROCESS_CONTINUOUSLY) equivalent).

    The stream schema is PROBED from the batch footer, never assumed: the
    driver-generated events.parquet stores ts as timestamp[us], which Spark
    reads natively; only if a layout ships TIMESTAMP(NANOS)-as-long does the
    nanos→micros division apply (mirroring sources/tables.py's batch path).
    """
    path = os.path.join(sf_dir, "events.parquet")
    schema = probe_parquet_schema(spark, path)
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .load(sf_dir)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
        # the cast is wall-clock-preserving under the UTC session timezone
        # (session.py pins spark.sql.session.timeZone=UTC).
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """senv.generateSequence equivalent: the rate source (monotonic value +
    proc-time timestamp)."""
    return (
        spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load()
    )


def state_partitions_for(
    spark: SparkSession,
    sf_dir: str,
    *tables: str,
    bytes_per_partition: int = 256 * 1024,
    floor: int = 4,
) -> int | None:
    """Scale-adaptive state-store partition count for a streaming query
    (r18, guide §2 — partitioning derived from input size, not a local
    constant).

    Every stateful operator plans ``spark.sql.shuffle.partitions`` state
    store instances, and EVERY micro-batch pays a fixed per-instance cost
    (store init + delta-file commit, plus one Arrow runner round-trip per
    partition for Python-stateful operators) regardless of how many keys
    the partition holds. When the source is KB-MB scale those fixed costs
    dominate the whole query: the r18 interleaved A/B
    (plans/r18/ab_stream_parts1.json) measured the four heavy streaming
    gates 1.2-2x faster at 8 partitions than at 32 on a 2 MB source, and
    the r17 driver's own 8-core bench ran stream_session_windows_chained
    3x faster purely because its session default was 8.

    The returned value is ``clamp(source_bytes / bytes_per_partition,
    floor, session shuffle.partitions)`` — it NEVER exceeds the session's
    configured value, so a production deployment (real shuffle.partitions
    sizing, multi-GB+ sources) is unchanged; the count only drops toward
    ``floor`` when the source itself is small enough that per-store fixed
    costs provably dominate. ``floor`` stays above 1 because the
    Python-stateful gates' per-key transition walk still wants real
    parallelism (the A/B shows the delta-trigger walk degrading below 8).
    Returns None (= keep the session default) when a size cannot be
    determined."""
    total = 0
    for t in tables or ("events",):
        path = os.path.join(sf_dir, f"{t}.parquet")
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    try:
        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return None
    n = (total + bytes_per_partition - 1) // bytes_per_partition
    return int(max(min(cap, n), min(floor, cap)))


def run_to_completion(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drive a (bounded) streaming DataFrame to completion into a memory
    sink and return the final result table. Test/oracle harness only — a
    production deployment writes to parquet/kafka with checkpointing.

    ``state_partitions`` (r18): number of shuffle/state-store partitions
    the streaming query plans with (see ``state_partitions_for``). The
    conf is set only for the ``start()`` call — Structured Streaming
    clones the session configuration into the query at start, so the
    running stream keeps the value while the session is restored
    immediately; keyed-state results are partition-count-independent."""
    spark = df.sparkSession
    writer = (
        df.writeStream.outputMode(output_mode).format("memory").queryName(query_name)
    )
    if state_partitions:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = writer.start()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    else:
        q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(query_name)


def events_stream_ooo(
    spark: SparkSession,
    sf_dir: str,
    block_ms: int = 7_200_000,
    n_blocks: int = 6,
) -> DataFrame:
    """The events table replayed OUT OF ORDER across micro-batches — the
    harness for event-time correctness tests of watermark-buffered
    operators (the reference's RowTime*Over / WindowOperator ITCases feed
    late elements the same way).

    Staging (once per sf, atomic rename — concurrent runs safe): rows are
    split into files [head] [b1 b0 b3 b2 b5 b4] [tail], where b0..b5
    are consecutive `block_ms` event-time blocks starting at 45% of the
    span and the pair-swap makes every other file arrive BEFORE an
    earlier-in-event-time file. File mtimes force that arrival order, and
    maxFilesPerTrigger=1 makes each file its own micro-batch, so a
    downstream operator sees genuinely late (but within-watermark-delay)
    data. With 2h blocks the worst lateness is < 4h, so any watermark
    delay >= 4h (callers use 5h) loses no rows.
    """
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    parent = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
    )
    os.makedirs(parent, exist_ok=True)
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    target = os.path.join(parent, f"ooo_events_{sf_tag}_{block_ms}_{n_blocks}")
    if not os.path.exists(os.path.join(target, "_SUCCESS")):
        tmp = tempfile.mkdtemp(prefix="ooo_stage_", dir=parent)
        tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        ts_us = tbl.column("ts").to_numpy().astype("datetime64[us]").astype("int64")
        lo, hi = int(ts_us.min()), int(ts_us.max())
        swap_start = lo + (hi - lo) * 45 // 100
        block_us = block_ms * 1000
        # piece index per row: 0 = head, 1..n_blocks = swapped blocks
        # (block i -> piece 1 + (i XOR 1)), n_blocks+1 = tail
        blk = (ts_us - swap_start) // block_us
        piece = np.where(
            ts_us < swap_start,
            0,
            np.where(blk >= n_blocks, n_blocks + 1, 1 + (blk ^ 1)),
        ).astype("int64")
        mtime_base = 1_000_000_000  # fixed epoch: deterministic ordering
        for p in range(n_blocks + 2):
            sub = tbl.filter(pa.array(piece == p))
            path = os.path.join(tmp, f"f{p:02d}.parquet")
            pq.write_table(sub, path)
            os.utime(path, (mtime_base + 60 * p, mtime_base + 60 * p))
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        os.utime(os.path.join(tmp, "_SUCCESS"), (mtime_base, mtime_base))
        if os.path.isdir(target) and not os.path.exists(
            os.path.join(target, "_SUCCESS")
        ):
            # A previous staging run crashed after creating target but
            # before its rename completed: os.replace onto a non-empty
            # dir fails ENOTEMPTY forever, and treating that as
            # "concurrent run won" would stream from the permanently
            # incomplete dir. Clear the stale target first.
            shutil.rmtree(target, ignore_errors=True)
        try:
            os.replace(tmp, target)  # atomic: same filesystem (sibling dirs)
        except OSError:
            if os.path.exists(os.path.join(target, "_SUCCESS")):
                shutil.rmtree(tmp, ignore_errors=True)  # concurrent run won
            else:
                raise  # neither ours nor a completed concurrent stage
    schema = probe_parquet_schema(spark, os.path.join(target, "f00.parquet"))
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .load(target)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


# THE single source for the late-replay split point. The staging below,
# the gate bodies' delay computation (via late_cut_ms) and the gates'
# oracle SQL literals (f-string interpolation in queries/streaming_q.py)
# all derive from this one constant — changing the cut in one place keeps
# the splitter delay and the staged late set in sync.
LATE_CUT_PCT = 55


def _late_cut_formula(lo: int, hi: int, cut_pct: int) -> int:
    """THE shared split-point formula (staging + gates + oracle all use
    its result for the same cut_pct over the same bounds)."""
    return lo + (hi - lo) * cut_pct // 100


def late_cut_ms(sf_dir: str, cut_pct: int = LATE_CUT_PCT) -> tuple[int, int, int]:
    """(lo, hi, cut) epoch-ms bounds of the staged late split — the same
    formula the staging applies. Cost: one driver-side read of the ts
    column (decoded to take min/max — NOT a footer-statistics-only
    probe); the staging path avoids this read entirely by applying the
    formula to the ts array it already holds."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    ts_ms = tbl.column("ts").to_numpy().astype("datetime64[ms]").astype("int64")
    lo, hi = int(ts_ms.min()), int(ts_ms.max())
    return lo, hi, _late_cut_formula(lo, hi, cut_pct)


def events_stream_late(
    spark: SparkSession,
    sf_dir: str,
    cut_pct: int = LATE_CUT_PCT,
) -> DataFrame:
    """The events table replayed so that a known subset arrives LATE —
    beyond the watermark — the harness for sideOutputLateData-style
    observability (WindowedStream.java:171; the reference exposes dropped
    late elements as a side output, Spark as the
    numRowsDroppedByWatermark state-operator metric).

    Staging (same atomic-rename discipline as events_stream_ooo): rows
    split at cut = lo + (hi - lo) * cut_pct // 100 on epoch-ms —
      f00: on-time rows (ts_ms >= cut) EXCEPT the earliest one; contains
           the global max ts, so the watermark jumps to hi - delay.
      f01: the single earliest on-time row — a spacer batch, because
           Spark's late filter uses the watermark lagged one micro-batch
           behind eviction; after this batch the filter watermark is
           hi - delay.
      f02: every row with ts_ms < cut — all far below the filter
           watermark by construction, so ALL of them are dropped and
           counted: drop count == COUNT(ts_ms < cut), SQL-expressible.
    File mtimes force arrival order; maxFilesPerTrigger=1 makes each file
    its own micro-batch.
    """
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    parent = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
    )
    os.makedirs(parent, exist_ok=True)
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    target = os.path.join(parent, f"late_events_{sf_tag}_{cut_pct}")
    if not os.path.exists(os.path.join(target, "_SUCCESS")):
        tmp = tempfile.mkdtemp(prefix="late_stage_", dir=parent)
        tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        ts_ms = (
            tbl.column("ts").to_numpy().astype("datetime64[us]").astype("int64")
            // 1000
        )
        ids = tbl.column("event_id").to_numpy().astype("int64")
        # the one shared formula, over the ts array already in memory
        # (no second read of the file)
        cut = _late_cut_formula(int(ts_ms.min()), int(ts_ms.max()), cut_pct)
        on_time = ts_ms >= cut
        # earliest on-time row by (ts_ms, event_id) — the spacer
        ot_idx = np.flatnonzero(on_time)
        spacer = ot_idx[np.lexsort((ids[ot_idx], ts_ms[ot_idx]))[0]]
        piece = np.where(on_time, 0, 2)
        piece[spacer] = 1
        mtime_base = 1_000_000_000
        for p in range(3):
            path = os.path.join(tmp, f"f{p:02d}.parquet")
            pq.write_table(tbl.filter(pa.array(piece == p)), path)
            os.utime(path, (mtime_base + 60 * p, mtime_base + 60 * p))
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        os.utime(os.path.join(tmp, "_SUCCESS"), (mtime_base, mtime_base))
        if os.path.isdir(target) and not os.path.exists(
            os.path.join(target, "_SUCCESS")
        ):
            shutil.rmtree(target, ignore_errors=True)  # stale crashed stage
        try:
            os.replace(tmp, target)
        except OSError:
            if os.path.exists(os.path.join(target, "_SUCCESS")):
                shutil.rmtree(tmp, ignore_errors=True)  # concurrent run won
            else:
                raise
    schema = probe_parquet_schema(spark, os.path.join(target, "f00.parquet"))
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .load(target)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def run_to_completion_observed(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> tuple[DataFrame, list]:
    """run_to_completion variant that also returns the query's progress
    events, for metric assertions (dropped-late-row counts etc.).
    ``state_partitions`` as in ``run_to_completion``."""
    spark = df.sparkSession
    writer = (
        df.writeStream.outputMode(output_mode).format("memory").queryName(query_name)
    )
    if state_partitions:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = writer.start()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    else:
        q = writer.start()
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(query_name), progress


def dropped_late_rows(progress: list) -> int:
    """Total input rows dropped by the watermark across a query's run —
    the observability half of the reference's sideOutputLateData
    (WindowedStream.java:171): Spark cannot re-route the dropped rows,
    but it counts them per stateful operator
    (StreamingQueryProgress.stateOperators[].numRowsDroppedByWatermark);
    SURVEY §2.9's 'dropped-late-rows observable via metrics' hook."""
    return sum(
        so.get("numRowsDroppedByWatermark", 0) if isinstance(so, dict)
        else so["numRowsDroppedByWatermark"]
        for pr in progress
        for so in (pr["stateOperators"] if isinstance(pr, dict) else pr["stateOperators"])
    )
