"""Queryable state (SURVEY §2.9 — previously approximated by memory-sink
tables, now a real state-store read path).

Reference: flink-runtime queryable state — QueryableStateClient.java:64
(`getKvState(jobId, registrationName, key, ...)`),
KeyedStream.asQueryableState (KeyedStream.java:987): an external client
reads the live keyed state of a running job, one key at a time, served
from the TaskManager's state backend.

Spark-first: Structured Streaming checkpoints every operator's keyed
state per micro-batch, and Spark 4's State Data Source
(`spark.read.format("statestore")` / `format("state-metadata")`) reads
those snapshots as DataFrames. That inverts the reference's access model
— instead of an RPC per key against a live TM, ANY Spark session can scan
the whole keyed state (or filter one key — partition pruning applies) at
the last committed batch, while the query keeps running, without
back-pressure on it. Point lookups are served at batch granularity
(the freshness of the last commit, not of in-flight rows) — the
documented semantic difference; everything the reference's client can
read is readable here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class QueryableStateClient:
    """QueryableStateClient.java:64 parity over a checkpoint location.

    The Flink client addresses state by (jobId, registrationName); here the
    address is (checkpoint_location, operator_id/store_name) — the
    `state_metadata()` frame enumerates what is queryable, like the
    registration listing."""

    def __init__(self, spark: SparkSession, checkpoint_location: str):
        self.spark = spark
        self.checkpoint_location = checkpoint_location

    def state_metadata(self) -> DataFrame:
        """Enumerate queryable stores: (operatorId, operatorName,
        stateStoreName, numPartitions, minBatchId, maxBatchId)."""
        return self.spark.read.format("state-metadata").load(self.checkpoint_location)

    def get_state(
        self,
        operator_id: int = 0,
        store_name: str | None = None,
        batch_id: int | None = None,
    ) -> DataFrame:
        """The full keyed state as a flat DataFrame: key fields then value
        fields (names prefixed on collision). `batch_id` time-travels to an
        earlier committed snapshot; default is the latest."""
        reader = self.spark.read.format("statestore").option(
            "operatorId", str(operator_id)
        )
        if store_name is not None:
            reader = reader.option("storeName", store_name)
        if batch_id is not None:
            reader = reader.option("batchId", str(batch_id))
        raw = reader.load(self.checkpoint_location)
        key_fields = raw.schema["key"].dataType.fieldNames()
        val_fields = raw.schema["value"].dataType.fieldNames()
        cols = [F.col(f"key.{f}").alias(f) for f in key_fields]
        cols += [
            F.col(f"value.{f}").alias(f if f not in key_fields else f"value_{f}")
            for f in val_fields
        ]
        return raw.select(*cols)

    def get_kv_state(self, key: dict, operator_id: int = 0, **kwargs) -> DataFrame:
        """Point lookup — getKvState parity: rows of the keyed state
        matching `key` (a {key_column: value} dict; partial keys select a
        key-prefix slice, which the reference's single-key RPC cannot)."""
        df = self.get_state(operator_id=operator_id, **kwargs)
        for col, val in key.items():
            df = df.filter(F.col(col) == F.lit(val))
        return df
