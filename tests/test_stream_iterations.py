"""Stream-iteration tests (DataStream.iterate / closeWith parity): the
feedback edge closed through storage must loop rows until their exit
condition holds, across as many micro-batch hops as each row needs."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from proteus_engine_spark.streaming.iterations import (
    iterative_stream,
    run_iterative_to_completion,
)


def test_halving_loop_counts_iterations(spark):
    # IterateExample shape: step halves v and increments c; rows loop while
    # v > 0. A row with initial v needs floor(log2(v)) + 1 hops (v=0: one).
    d = tempfile.mkdtemp(prefix="stream_iter_")
    src_dir = f"{d}/src"
    spark.createDataFrame(
        [(1, 13, 0), (2, 1, 0), (3, 0, 0), (4, 1024, 0)], "id long, v long, c long"
    ).coalesce(1).write.parquet(src_dir)
    source = spark.readStream.schema("id long, v long, c long").parquet(src_dir)

    def step(df):
        return df.select("id", (F.col("v") / 2).cast("long").alias("v"),
                         (F.col("c") + 1).alias("c"))

    body, fb = iterative_stream(
        spark, source, step, F.col("v") > 0, f"{d}/feedback"
    )
    out = run_iterative_to_completion(body, fb, f"{d}/feedback", f"{d}/out", "it_halve")
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got == {1: 4, 2: 1, 3: 1, 4: 11}
    # every emitted row actually reached the exit condition
    assert all(r["v"] == 0 for r in out.collect())


def test_checkpointed_restart_is_exactly_once(spark):
    # With a checkpoint, restarting the loop query resumes from committed
    # offsets: nothing re-processes, no epoch file duplicates, and the
    # output is byte-for-byte the first run's (per-epoch b{batch_id}
    # file naming means even a replayed epoch would overwrite itself).
    import os

    d = tempfile.mkdtemp(prefix="stream_iter_ckpt_")
    src_dir = f"{d}/src"
    spark.createDataFrame([(1, 4, 0), (2, 2, 0)], "id long, v long, c long")\
        .coalesce(1).write.parquet(src_dir)

    def run():
        source = spark.readStream.schema("id long, v long, c long").parquet(src_dir)

        def step(df):
            return df.select("id", (F.col("v") / 2).cast("long").alias("v"),
                             (F.col("c") + 1).alias("c"))

        body, fb = iterative_stream(
            spark, source, step, F.col("v") > 0, f"{d}/feedback"
        )
        return run_iterative_to_completion(
            body, fb, f"{d}/feedback", f"{d}/out", "it_ckpt",
            checkpoint=f"{d}/ckpt",
        )

    first = sorted((r["id"], r["c"]) for r in run().collect())
    files_after_first = sorted(os.listdir(f"{d}/out"))
    second = sorted((r["id"], r["c"]) for r in run().collect())  # restart
    assert first == second == [(1, 3), (2, 2)]
    assert sorted(os.listdir(f"{d}/out")) == files_after_first
