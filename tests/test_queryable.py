"""Queryable-state tests (QueryableStateClient parity via the Spark 4
state data source): full-state snapshot equals the batch aggregate, point
lookups, metadata enumeration, and reading state while the query runs."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from proteus_engine_spark.streaming.queryable import QueryableStateClient


def _checkpointed_agg(spark, rows, ckpt, name):
    d = tempfile.mkdtemp(prefix="qstate_src_")
    spark.createDataFrame(
        rows, "event_id long, k long, value double"
    ).coalesce(1).write.parquet(f"{d}/b0")
    stream = spark.readStream.schema("event_id long, k long, value double").parquet(
        f"{d}/b0"
    )
    agg = stream.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    return agg.writeStream.outputMode("complete").format("memory").queryName(
        name
    ).option("checkpointLocation", ckpt).start()


def test_state_snapshot_matches_batch(spark):
    rows = [(i, i % 3, float(i)) for i in range(30)]
    ckpt = tempfile.mkdtemp(prefix="qstate_ckpt_")
    q = _checkpointed_agg(spark, rows, ckpt, "qs_snap")
    q.processAllAvailable()
    try:
        client = QueryableStateClient(spark, ckpt)
        # read state WHILE the query is running (last committed batch)
        live = {r["k"]: (r["count"], r["sum"]) for r in client.get_state().collect()}
    finally:
        q.stop()
        q.awaitTermination()
    expect = {k: (10, sum(float(i) for i in range(30) if i % 3 == k)) for k in range(3)}
    assert live == expect
    # and after the query stopped, the snapshot is still there
    again = {r["k"]: (r["count"], r["sum"]) for r in client.get_state().collect()}
    assert again == expect


def test_point_lookup_and_metadata(spark):
    rows = [(i, i % 4, 1.0) for i in range(20)]
    ckpt = tempfile.mkdtemp(prefix="qstate_ckpt_")
    q = _checkpointed_agg(spark, rows, ckpt, "qs_point")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    client = QueryableStateClient(spark, ckpt)
    md = client.state_metadata().collect()
    assert any(r["operatorId"] == 0 and r["maxBatchId"] >= 0 for r in md)
    one = client.get_kv_state({"k": 2}).collect()
    assert len(one) == 1 and one[0]["count"] == 5
    none = client.get_kv_state({"k": 99}).collect()
    assert none == []
