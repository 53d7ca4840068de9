"""Temporal-join and sink/iteration queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proteus_engine_spark.operators.temporal import as_of_join, range_join
from proteus_engine_spark.queries.registry import register
from proteus_engine_spark.sources import load_table


@register(
    "asof_join_events",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'signup'
    )
    SELECT p.user_id, p.event_id, p.value,
           s.value AS last_signup_value
    FROM purchases p ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
    tags=("temporal", "join"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time lookup): for each purchase, the value of
    the user's latest signup at or before it. Implemented with the
    union-tag + last(ignorenulls) window — one shuffle, no pandas.
    Oracle: DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("signup_value")
    )
    out = as_of_join(
        purchases, signups, key="user_id", left_ts="ts", right_ts="ts",
        right_vals=["signup_value"],
    )
    return out.select(
        "user_id", "event_id", "value", F.col("signup_value").alias("last_signup_value")
    )


@register(
    "range_join_events",
    oracle="""
    SELECT e.event_id AS error_id, v.event_id AS view_id, e.user_id
    FROM events e JOIN events v
      ON e.user_id = v.user_id
     AND e.event_type = 'error' AND v.event_type = 'view'
     AND v.ts >= e.ts - INTERVAL 5 MINUTE
     AND v.ts <= e.ts + INTERVAL 5 MINUTE
    """,
    tags=("temporal", "join"),
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch range join: views within ±5 minutes of each error, same user."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    return range_join(
        errors, views, F.col("user_id") == F.col("v_user"), "e_ts", "v_ts",
        lower="5 minutes", upper="5 minutes",
    ).select("error_id", "view_id", "user_id")
