"""Network stream path, end-to-end (round-4 verdict item 6): real bytes
travel a TCP connection into Spark's socket source, through the shared
JSON parse projection, the watermarked sliding-window aggregation, and a
memory sink — then the result is compared against the batch q20 body over
the identical rows. This is the only stream-source class the container
can integration-test (no Kafka broker); the parse + window plan is
byte-identical to the kafka branch's.
"""

from __future__ import annotations

import json
import socket
import threading
import time

import pytest

from trafficteach_spark.operators.windows import sliding_window_agg
from trafficteach_spark.streaming import demo

# Event times inside one late morning so the windows are few and dense.
_BASE_NS = 1_720_000_000 * 1_000_000_000  # 2024-07-03T09:46:40Z
_MIN_NS = 60 * 1_000_000_000

EVENTS = [
    {"event_id": i, "ts": _BASE_NS + i * 7 * _MIN_NS, "user_id": 100 + i % 3,
     "event_type": t, "value": float(10 * (i + 1)), "props": "{}"}
    for i, t in enumerate(["view", "click", "view", "purchase", "click", "view"])
]


def _serve(server: socket.socket, payload: bytes, done: threading.Event) -> None:
    # One accepted connection; write everything, then hold the socket open
    # until the test confirms processing (closing early can abort the
    # query mid-batch).
    try:
        conn, _ = server.accept()
        conn.sendall(payload)
        done.wait(timeout=90)
        conn.close()
    except OSError:
        pass


def test_socket_stream_matches_batch_q20(spark):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    payload = "".join(json.dumps(e) + "\n" for e in EVENTS).encode()
    done = threading.Event()
    t = threading.Thread(target=_serve, args=(server, payload, done), daemon=True)
    t.start()

    events = demo.read_event_stream(
        spark, source="socket",
        socket_options={"host": "127.0.0.1", "port": port},
    )
    assert events.isStreaming
    agg = demo.stream_sliding_avg(events)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_socket")
        .start()
    )
    try:
        # Batch expectation: the same rows through the same aggregation body.
        batch_df = spark.createDataFrame(
            [tuple(e.values()) for e in EVENTS],
            "event_id long, ts long, user_id long, event_type string, value double, props string",
        ).withColumn("ts", demo.F.timestamp_micros(demo.F.expr("ts div 1000")).cast("timestamp_ntz"))
        expected = {tuple(r) for r in sliding_window_agg(batch_df).collect()}
        assert expected, "fixture must produce windows"

        deadline = time.monotonic() + 60
        streamed: set = set()
        while time.monotonic() < deadline:
            streamed = {tuple(r) for r in spark.table("t_socket").collect()}
            if streamed == expected:
                break
            time.sleep(1)
        assert streamed == expected
    finally:
        done.set()
        q.stop()
        server.close()


def test_socket_source_requires_host_and_port(spark):
    with pytest.raises(ValueError, match="socket_options"):
        demo.read_event_stream(spark, source="socket", socket_options={"host": "x"})
