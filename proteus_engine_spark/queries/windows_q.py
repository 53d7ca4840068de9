"""Batch group-window queries: TUMBLE / HOP / SESSION over the events table
(SURVEY §2.4 batch group-window agg, DataSetWindowAggregate.scala:42), plus
the count-window operator (§2.9, KeyedStream.countWindow) in its bounded
form.

Oracle notes:
- TUMBLE ↔ DuckDB time_bucket (both epoch-aligned).
- HOP expands each row into size/slide buckets; the oracle does the same
  expansion with a UNION ALL per offset.
- SESSION ↔ gaps-and-islands SQL (lag + running flag sum); Spark's
  session_window end = last_ts + gap, mirrored exactly.
- COUNT WINDOW ↔ row_number()-based chunking on a deterministic per-key
  order (ts, event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from proteus_engine_spark.operators.windows import session_agg, tumble_agg
from proteus_engine_spark.queries.exact import dsum
from proteus_engine_spark.queries.registry import register
from proteus_engine_spark.sources import load_table


@register(
    "window_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("window", "events"),
)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE group-window (TumblingEventTimeWindows parity) on batch."""
    ev = load_table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        F.count(F.lit(1)).alias("n"),
        dsum("value", "total_value"),
    ).select("window_start", "window_end", "event_type", "n", "total_value")


@register(
    "window_hop",
    oracle="""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, event_type, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS window_start, event_type, value FROM events
    )
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY 1, 2, 3
    """,
    tags=("window", "events"),
)
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP (sliding) group-window, size 1h slide 30m
    (SlidingEventTimeWindows parity): each row contributes to 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "window_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 30 MINUTE AS window_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM islands
    GROUP BY user_id, sid
    """,
    tags=("window", "events"),
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION group-window, 30 min gap (EventTimeSessionWindows / merging
    assigner parity — Spark's session_window merges inside the aggregate,
    one shuffle on (user_id, session))."""
    ev = load_table(spark, sf_dir, "events")
    return session_agg(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        F.count(F.lit(1)).alias("n"),
        dsum("value", "total_value"),
    ).select("user_id", "window_start", "window_end", "n", "total_value")


@register(
    "window_count_tumbling",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           CAST((rn - 1) // 10 AS BIGINT) AS win_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, (rn - 1) // 10
    """,
    tags=("window", "events", "stateful"),
)
def window_count_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count window (KeyedStream.countWindow, KeyedStream.java:383) in
    bounded form: deterministic per-key order (ts, event_id), chunks of 10.
    The unbounded/streaming variant lives in streaming.stateful (same
    chunking semantics via applyInPandasWithState)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("win_id", F.floor((F.col("rn") - 1) / 10).cast("long"))
        .groupBy("user_id", "win_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
    )


@register(
    "window_tumble_sql",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("window", "sql_rewrite"),
)
def window_tumble_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Flink-1.4 SQL surface itself: TUMBLE/TUMBLE_START/TUMBLE_END in
    the statement, rewritten pre-Catalyst by plans.sql_rewrite
    (DataSetLogicalWindowAggregateRule parity, FlinkRuleSets.scala:155)."""
    from proteus_engine_spark.plans import proteus_sql

    load_table(spark, sf_dir, "events").createOrReplaceTempView("__ev_tw_sql__")
    return proteus_sql(
        spark,
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS window_end,
               event_type, COUNT(*) AS n
        FROM __ev_tw_sql__
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        """,
    )
