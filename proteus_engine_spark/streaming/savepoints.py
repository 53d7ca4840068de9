"""Savepoints (SURVEY §2.9 — previously listed under documented non-goals
as "savepoint compatibility").

Reference: manually-triggered, self-contained, relocatable state
snapshots — SavepointCoordinator / `flink savepoint <jobId> [dir]` and
`flink run -s <savepoint>` (flink-runtime .../checkpoint/savepoint/
SavepointStore.java:47; CliFrontend savepoint handling). A savepoint
differs from a periodic checkpoint in ownership and lifecycle: the USER
owns it, it survives job cancellation, and a new job can start from it.

Spark-first: a Structured Streaming checkpointLocation already contains
the complete restart state (source offsets, commit log, operator state
store). BINARY compatibility with the reference's format is impossible by
design — the equivalent MECHANISM is a consistent copy of the checkpoint
directory taken while no query holds it: that copy is exactly a
savepoint (user-owned, survives dropping the original checkpoint,
restartable N times by restoring to fresh checkpoint locations, each
restore an independent fork). Like the reference's savepoints — which
embed source-specific positions such as Kafka offsets — the snapshot
references its sources (file paths, topic offsets) absolutely; relocate
the savepoint freely, not the sources.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql.streaming import StreamingQuery


def trigger_savepoint(
    checkpoint: str, savepoint: str, query: StreamingQuery | None = None
) -> str:
    """`flink savepoint` / stop-with-savepoint parity: snapshot the
    query's checkpoint into a user-owned directory. If `query` is given it
    is stopped first (a running query mutates the checkpoint mid-copy —
    the same reason the reference coordinates savepoints with a barrier).
    Returns the savepoint path; refuses to overwrite an existing one
    (savepoints are immutable)."""
    if query is not None:
        query.stop()
        query.awaitTermination()
    if os.path.exists(savepoint):
        raise ValueError(f"savepoint already exists (immutable): {savepoint}")
    shutil.copytree(checkpoint, savepoint)
    return savepoint


def restore_from_savepoint(savepoint: str, new_checkpoint: str) -> str:
    """`flink run -s <savepoint>` parity: materialize a FRESH checkpoint
    location from the savepoint and return it — start the restarted query
    with this as its checkpointLocation. The savepoint itself is never
    handed to a query (it would mutate it); every restore is an
    independent fork, so one savepoint can seed many restarts."""
    if os.path.exists(new_checkpoint) and os.listdir(new_checkpoint):
        raise ValueError(f"refusing to restore over non-empty: {new_checkpoint}")
    if os.path.exists(new_checkpoint):
        os.rmdir(new_checkpoint)
    shutil.copytree(savepoint, new_checkpoint)
    return new_checkpoint
