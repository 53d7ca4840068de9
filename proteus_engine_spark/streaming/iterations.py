"""Stream iterations (SURVEY §2.9 — previously a documented non-goal).

Reference: DataStream.iterate() (DataStream.java:477) /
IterativeStream.closeWith (IterativeStream.java:79): the iteration head
re-ingests a feedback stream selected from the loop body's output; the
canonical IterateExample (flink-examples-streaming .../iteration/
IterateExample.java:83-98) maps each tuple through a step function, routes
not-yet-done tuples to the 'iterate' channel and finished ones to
'output'.

Spark-first: Structured Streaming's DAG has no in-graph feedback edge, so
the loop is closed THROUGH STORAGE at micro-batch granularity — the
iteration head is `source ∪ fileStream(feedback_dir)`, the body routes
each processed micro-batch with foreachBatch: feedback rows are appended
to feedback_dir (where the head's file source discovers them next
trigger), finished rows to the output sink. Latency per hop is one
micro-batch (the reference's in-memory edge is sub-second; its
`iterate(maxWaitMillis)` timeout exists because that edge can deadlock on
backpressure — the storage edge cannot, it just spills to files, and is
exactly-once under checkpointing because the feedback write is an
idempotent per-batch file commit).

Scale: the feedback volume per trigger is the live frontier, not the
corpus; each hop's files are pruned by normal file-source listing. For a
long-running production loop, compact or TTL the feedback dir (it only
ever needs the unprocessed tail); `run_iterative_to_completion` is the
bounded test/oracle harness, like `sources.run_to_completion`.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession


def iterative_stream(
    spark: SparkSession,
    source: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    feedback: Column,
    feedback_dir: str,
    schema: str | None = None,
) -> tuple[DataFrame, Column]:
    """Build the iteration: returns (body, feedback) where `body` is
    step(source ∪ feedback_stream). The feedback schema is the BODY's
    output schema (closeWith contract: the fed-back stream must be
    head-compatible — here both head inputs and the step are required to
    share one iteration-tuple schema, the IterateExample shape; pass
    `schema` to override the inferred one)."""
    os.makedirs(feedback_dir, exist_ok=True)
    fb_schema = schema or source.schema
    fb_stream = spark.readStream.schema(fb_schema).parquet(feedback_dir)
    head = source.unionByName(fb_stream)
    return step(head), feedback


def run_iterative_to_completion(
    body: DataFrame,
    feedback: Column,
    feedback_dir: str,
    out_dir: str,
    query_name: str,
) -> DataFrame:
    """Drive the loop until quiescent: each micro-batch routes rows
    matching `feedback` back to the head (append to feedback_dir) and the
    rest to out_dir; processAllAvailable() keeps triggering while feedback
    files keep appearing, so it returns exactly when the loop drains.
    Returns the accumulated output as a batch DataFrame."""
    spark = body.sparkSession
    os.makedirs(out_dir, exist_ok=True)

    def route(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)  # route both ways off one pass
        fb = batch_df.filter(feedback)
        # an empty append still creates a file the head would "discover",
        # triggering an empty batch forever — only write a live frontier
        if not fb.isEmpty():
            fb.coalesce(1).write.mode("append").parquet(feedback_dir)
        done = batch_df.filter(~feedback)
        if not done.isEmpty():
            done.coalesce(1).write.mode("append").parquet(out_dir)

    q = body.writeStream.foreachBatch(route).queryName(query_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.read.parquet(out_dir)
