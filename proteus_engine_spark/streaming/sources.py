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


def run_to_completion(df: DataFrame, query_name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a (bounded) streaming DataFrame to completion into a memory
    sink and return the final result table. Test/oracle harness only — a
    production deployment writes to parquet/kafka with checkpointing."""
    spark = df.sparkSession
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(query_name)
