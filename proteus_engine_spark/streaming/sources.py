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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as an unbounded stream (file source monitoring the
    parquet path — the senv.readFile(PROCESS_CONTINUOUSLY) equivalent).
    ts arrives as long nanos (see sources/tables.py) → converted to a
    proper event-time timestamp column for watermarking."""
    # Runtime conf so the read works under any caller-supplied session (the
    # driver gate uses a vanilla SparkSession without the engine's defaults).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
