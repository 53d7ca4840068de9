"""Kafka connector option-builder semantics (no broker in this env — the
builders are pure; FlinkKafkaProducer011.java:94 Semantic parity)."""

from __future__ import annotations

import json

import pytest

from proteus_engine_spark.sources import kafka as K


def test_source_options_topic_list_and_pattern_exclusive():
    opts = K.source_options("b:9092", topics=["a", "b"])
    assert opts["subscribe"] == "a,b"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "true"
    opts = K.source_options("b:9092", pattern="events-.*", starting_offsets="latest")
    assert opts["subscribePattern"] == "events-.*"
    assert opts["startingOffsets"] == "latest"
    with pytest.raises(ValueError):
        K.source_options("b:9092")  # neither
    with pytest.raises(ValueError):
        K.source_options("b:9092", topics=["a"], pattern="x.*")  # both


def test_source_rate_cap():
    opts = K.source_options("b:9092", topics=["t"], max_offsets_per_trigger=50_000)
    assert opts["maxOffsetsPerTrigger"] == "50000"


def test_sink_semantics_mapping():
    none = K.sink_options("b:9092", "out", semantic=K.NONE)
    assert none["kafka.acks"] == "1" and "kafka.enable.idempotence" not in none
    alo = K.sink_options("b:9092", "out", semantic=K.AT_LEAST_ONCE)
    assert alo["kafka.acks"] == "all" and "checkpointLocation" not in alo
    eo = K.sink_options(
        "b:9092", "out", semantic=K.EXACTLY_ONCE,
        checkpoint_location="/tmp/ck", transaction_timeout_ms=900_000,
    )
    assert eo["checkpointLocation"] == "/tmp/ck"
    assert eo["kafka.enable.idempotence"] == "true"
    assert eo["kafka.acks"] == "all"
    assert eo["kafka.transaction.timeout.ms"] == "900000"


def test_exactly_once_requires_checkpoint():
    # the reference requires enabled checkpointing for Semantic.EXACTLY_ONCE
    with pytest.raises(ValueError):
        K.sink_options("b:9092", "out", semantic=K.EXACTLY_ONCE)
    with pytest.raises(ValueError):
        K.sink_options("b:9092", "out", semantic="bogus")


def test_to_kafka_frame_layout(spark):
    df = spark.createDataFrame(
        [(1, "signup", 2.5)], "user_id long, event_type string, value double"
    )
    out = K.to_kafka_frame(df, key_col="user_id")
    assert out.columns == ["key", "value"]
    assert dict(out.dtypes) == {"key": "binary", "value": "binary"}
    row = out.collect()[0]
    assert bytes(row["key"]) == b"1"
    assert json.loads(bytes(row["value"])) == {"event_type": "signup", "value": 2.5}
    # no key: value-only frame
    out2 = K.to_kafka_frame(df, value_cols=["user_id"])
    assert out2.columns == ["value"]
    assert json.loads(bytes(out2.collect()[0]["value"])) == {"user_id": 1}
