"""Kafka source/sink configuration builders (SURVEY §2.1).

Reference: flink-connectors/flink-connector-kafka-0.11 —
FlinkKafkaConsumer011 (startup modes, topic list/pattern subscription) and
FlinkKafkaProducer011 (FlinkKafkaProducer011.java:94: Semantic.EXACTLY_ONCE
/ AT_LEAST_ONCE / NONE, transactional producer pools, transaction.timeout
coupling to the checkpoint interval).

Spark-first mapping: Structured Streaming's kafka source is already
offset-tracked through the checkpoint (the FlinkKafkaConsumer's state), so
the consumer side is a pure option translation. The producer semantics map
as:

  NONE          → fire-and-forget producer (acks=1, no idempotence)
  AT_LEAST_ONCE → acks=all + retries; duplicates possible on retry —
                  identical to the reference's AT_LEAST_ONCE (flush on
                  checkpoint)
  EXACTLY_ONCE  → checkpointed source offsets + idempotent producer
                  (enable.idempotence, acks=all). Spark's kafka sink has no
                  transactional two-phase commit (the reference's
                  KafkaTransactionState pool), so cross-failure duplicates
                  are fenced per-partition by the idempotent producer and
                  end-to-end by keyed compaction/dedup downstream; a
                  checkpoint location is REQUIRED, exactly as the
                  reference requires checkpointing for EXACTLY_ONCE.

No broker ships in this environment, so everything here is buildable and
unit-testable without one: the option builders are pure, and the
load()/start() wrappers are thin. `to_kafka_frame` prepares the
key/value binary layout the kafka sink contract requires.

Environment probe log (the e2e gate builds the moment this changes):
- r10: no broker, no spark-sql-kafka jar — blocked.
- r15 (2026-08-16): re-probed — /opt/spark/jars has no kafka artifact,
  no kafka CLI on PATH, localhost:9092 refuses connections. Still
  blocked.
- r16 (2026-08-16): re-probed — no kafka CLI, no spark-sql-kafka or
  kafka-clients jar anywhere under /, no python kafka client,
  localhost:9092 refuses connections. Still blocked.
- r17 (2026-08-16): re-probed — no kafka CLI, no kafka jar under /
  (only AWS SDK metadata dirs and reference source trees match the
  name), `import kafka` fails, localhost:9092 refuses connections.
  Still blocked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# FlinkKafkaProducer011.Semantic parity
NONE = "none"
AT_LEAST_ONCE = "at_least_once"
EXACTLY_ONCE = "exactly_once"
_SEMANTICS = (NONE, AT_LEAST_ONCE, EXACTLY_ONCE)


def source_options(
    bootstrap_servers: str,
    topics: list[str] | None = None,
    pattern: str | None = None,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """FlinkKafkaConsumer011 option translation: topic list OR pattern
    subscription (exactly one), startup mode, rate cap. Offset tracking is
    the stream checkpoint's job — there is no group-id-committed position,
    same as the reference's checkpointed consumer."""
    if (topics is None) == (pattern is None):
        raise ValueError("exactly one of topics / pattern is required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(bool(fail_on_data_loss)).lower(),
    }
    if topics is not None:
        opts["subscribe"] = ",".join(topics)
    else:
        opts["subscribePattern"] = pattern
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    return opts


def sink_options(
    bootstrap_servers: str,
    topic: str,
    semantic: str = EXACTLY_ONCE,
    checkpoint_location: str | None = None,
    transaction_timeout_ms: int | None = None,
) -> dict[str, str]:
    """FlinkKafkaProducer011 semantics → Spark kafka sink + producer confs.
    EXACTLY_ONCE requires a checkpoint location (the reference requires
    enabled checkpointing, FlinkKafkaProducer011.java:94 docs) and pins the
    idempotent-producer settings; transaction_timeout_ms mirrors the
    reference's transaction.timeout.ms guidance (must exceed the expected
    checkpoint interval)."""
    if semantic not in _SEMANTICS:
        raise ValueError(f"unknown semantic {semantic!r}; expected one of {_SEMANTICS}")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
    if semantic == NONE:
        opts["kafka.acks"] = "1"
    elif semantic == AT_LEAST_ONCE:
        opts["kafka.acks"] = "all"
        opts["kafka.retries"] = "2147483647"
    else:  # EXACTLY_ONCE
        if checkpoint_location is None:
            raise ValueError(
                "EXACTLY_ONCE requires checkpoint_location (the reference "
                "likewise requires checkpointing for Semantic.EXACTLY_ONCE)"
            )
        opts["checkpointLocation"] = checkpoint_location
        opts["kafka.acks"] = "all"
        opts["kafka.enable.idempotence"] = "true"
        opts["kafka.max.in.flight.requests.per.connection"] = "5"
        if transaction_timeout_ms is not None:
            opts["kafka.transaction.timeout.ms"] = str(int(transaction_timeout_ms))
    return opts


def to_kafka_frame(
    df: DataFrame, key_col: str | None = None, value_cols: list[str] | None = None
) -> DataFrame:
    """Shape a DataFrame to the kafka sink contract: binary `key` plus a
    JSON-encoded binary `value` (the reference's KeyedSerializationSchema).
    value_cols=None serializes every non-key column."""
    cols = value_cols or [c for c in df.columns if c != key_col]
    out = df.select(
        *( [F.col(key_col).cast("string").cast("binary").alias("key")] if key_col else [] ),
        F.to_json(F.struct(*cols)).cast("binary").alias("value"),
    )
    return out


def kafka_source(spark: SparkSession, **kwargs) -> DataFrame:
    """readStream.format('kafka') with translated options. Requires the
    spark-sql-kafka package on the classpath (not shipped here — the
    builder itself is broker-free)."""
    return spark.readStream.format("kafka").options(**source_options(**kwargs)).load()


def kafka_sink(df: DataFrame, **kwargs):
    """writeStream.format('kafka') with translated options; returns the
    started StreamingQuery."""
    return df.writeStream.format("kafka").options(**sink_options(**kwargs)).start()
