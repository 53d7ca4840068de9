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
