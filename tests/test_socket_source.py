"""socketTextStream parity test (StreamExecutionEnvironment.socketTextStream,
StreamExecutionEnvironment.java:1186): a real TCP server feeds Spark's
socket source in local mode — the one stream source in the env that is
neither parquet nor rate, so the source layer is exercised end-to-end
without any file-format decode path."""

from __future__ import annotations

import socket
import threading
import time

def test_socket_text_stream_counts(spark):
    lines = [f"word{i % 3}" for i in range(12)]
    ready = threading.Event()
    stop = threading.Event()
    port_holder = {}

    def server():
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        port_holder["port"] = srv.getsockname()[1]
        srv.listen(1)
        ready.set()
        conn, _ = srv.accept()
        conn.sendall(("\n".join(lines) + "\n").encode())
        # keep the connection open until the query is done — the source
        # treats a closed socket as end-of-stream/failure
        stop.wait(60)
        conn.close()
        srv.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    assert ready.wait(10)

    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", str(port_holder["port"]))
        .load()
    )
    agg = stream.groupBy("value").count()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("socket_counts")
        .start()
    )
    try:
        deadline = time.time() + 60
        total = 0
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.table("socket_counts").collect()
            total = sum(r["count"] for r in rows)
            if total >= len(lines):
                break
            time.sleep(0.5)
        got = {r["value"]: r["count"] for r in spark.table("socket_counts").collect()}
        assert got == {"word0": 4, "word1": 4, "word2": 4}
    finally:
        stop.set()
        q.stop()


def test_socket_sink_round_trip(spark):
    """writeToSocket parity (DataStream.writeToSocket): a bounded file
    stream drains through the socket SINK into an in-process TCP server;
    every line arrives exactly once in batch order."""
    import os
    import socket
    import tempfile
    import threading

    from proteus_engine_spark.sources.sinks import stream_to_socket

    received = []
    ready = threading.Event()
    done = threading.Event()
    port_holder = {}

    def server():
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        port_holder["port"] = srv.getsockname()[1]
        srv.listen(1)
        ready.set()
        conn, _ = srv.accept()
        conn.settimeout(30)
        buf = b""
        try:
            while not done.is_set():
                try:
                    chunk = conn.recv(4096)
                except socket.timeout:
                    break
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    received.append(line.decode())
                if len(received) >= 25:
                    done.set()
        finally:
            conn.close()
            srv.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    assert ready.wait(10)

    d = tempfile.mkdtemp(prefix="proteus_socket_sink_")
    src = f"{d}/src"
    os.makedirs(src)
    rows = [(i, f"line{i:02d}") for i in range(25)]
    spark.createDataFrame(rows, "id long, value string").coalesce(1).write.parquet(
        f"{d}/stage"
    )
    part = [f for f in os.listdir(f"{d}/stage") if f.endswith(".parquet")][0]
    os.rename(f"{d}/stage/{part}", f"{src}/00.parquet")
    stream = spark.readStream.schema("id long, value string").parquet(src)
    q = stream_to_socket(stream, "127.0.0.1", port_holder["port"])
    try:
        q.processAllAvailable()
        assert done.wait(30)
    finally:
        done.set()
        q.stop()
        q.awaitTermination()
    assert sorted(received) == [f"line{i:02d}" for i in range(25)]
