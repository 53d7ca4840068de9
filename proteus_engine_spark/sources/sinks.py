"""Sinks (SURVEY §2.1).

Reference: DataSet.writeAsText/writeAsCsv/write/output (/root/reference/
flink-java/src/main/java/org/apache/flink/api/java/DataSet.java:1492,1564,
1740,1780), CsvTableSink + Append/Retract/UpsertStreamTableSink
(flink-libraries/flink-table/.../sinks/*.scala), BucketingSink
(flink-connectors/flink-connector-filesystem), insertInto
(table.scala:876), Kafka 0.11 exactly-once producer
(FlinkKafkaProducer011.java:94).

Spark-first: `df.write` / `writeStream` cover all of these. The retract/
upsert sink taxonomy maps to output modes:
  AppendStreamTableSink  → outputMode("append")
  RetractStreamTableSink → outputMode("update")  (changed rows re-emitted)
  UpsertStreamTableSink  → outputMode("update") + keyed idempotent write
    via foreachBatch MERGE/overwrite-partition
Exactly-once: checkpointed source offsets + idempotent/transactional sink
(parquet job-commit or kafka transactions) — the same two-phase story as
the reference's TwoPhaseCommitSinkFunction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """DataSet.writeAsText parity (single string column)."""
    df.write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, **options) -> None:
    """DataSet.writeAsCsv / CsvTableSink parity."""
    df.write.mode(mode).option("header", str(header).lower()).options(**options).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Generic columnar sink; `partition_by` is the BucketingSink equivalent
    (time/size-bucketed directory layout → hive-partitioned directories,
    which also unlocks partition pruning on re-read — a strict upgrade).

    `bucket_by=(n, cols)` hash-buckets files by join key so later joins on
    those keys skip the shuffle entirely (the co-located join setup;
    requires saveAsTable with a metastore-backed name)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires table_name (saveAsTable)")
        w.format("parquet").bucketBy(n, *cols).sortBy(*cols).saveAsTable(table_name)
        return
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON sink (the reference's JsonRowSerializationSchema
    surface, file-backed)."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC columnar sink (reference: flink-formats orc writer) — native."""
    df.write.mode(mode).orc(path)


def insert_into(df: DataFrame, table: str, overwrite: bool = False) -> None:
    """Table.insertInto / sqlUpdate("INSERT INTO ...") parity (table.scala:876)."""
    df.write.insertInto(table, overwrite=overwrite)


def stream_to_parquet(
    df: DataFrame, path: str, checkpoint: str, partition_by: list[str] | None = None
):
    """Streaming file sink with exactly-once job-commit semantics
    (BucketingSink + checkpointing parity). Returns the StreamingQuery."""
    w = df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.outputMode("append").start()


def stream_foreach_batch(
    df: DataFrame, fn: Callable[[DataFrame, int], None], checkpoint: str, output_mode: str = "update"
):
    """Upsert/retract sink adapter: fn(batch_df, epoch_id) runs per
    micro-batch with the epoch id for idempotence — the
    UpsertStreamTableSink / TwoPhaseCommit hook."""
    return (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )


def stream_to_socket(
    df, host: str, port: int, value_col: str = "value", checkpoint: str | None = None
):
    """Socket sink (DataStream.writeToSocket, DataStream.java — serialize
    each record and push it over one TCP connection). Spark ships no
    socket sink, so this is a foreachBatch writer: per micro-batch the
    value column is collected IN ORDER and written as newline-delimited
    text over a persistent connection (opened lazily, reused across
    batches within the writer's lifetime — the reference keeps one
    connection too).

    At-least-once like the reference's socket sink (a retried batch
    re-sends its lines; TCP gives no transactional sink to anchor
    exactly-once). Rows cross the driver (the sink is inherently a single
    serialization point), but via ``toLocalIterator`` — driver memory is
    bounded by ONE PARTITION at a time, not the whole micro-batch; lines
    are flushed to the socket in ~64 KiB chunks as partitions stream in.
    For high volume use the kafka/file sinks."""
    state: dict = {}

    def send(batch_df, _epoch):
        import socket as socketlib

        buf: list[str] = []
        buf_len = 0
        for row in batch_df.select(value_col).toLocalIterator():
            if "conn" not in state:
                state["conn"] = socketlib.create_connection((host, port))
            buf.append(str(row[value_col]) + "\n")
            buf_len += len(buf[-1])
            if buf_len >= 65536:
                state["conn"].sendall("".join(buf).encode())
                buf, buf_len = [], 0
        if buf:
            state["conn"].sendall("".join(buf).encode())

    w = df.writeStream.foreachBatch(send).outputMode("append")
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
