"""SRC-1: live TCP socket source (the reference's dump1090 :30003
feed) — a local server thread streams SBS-1 lines; the engine's socket
source + parse stage consume them."""

import socket
import socketserver
import threading
import time

import pytest

LINES = [
    "MSG,3,1,1,50CC01,1,2024/05/01,10:00:00.000,2024/05/01,10:00:00.000,,4500,,,47.3,-1.7,,,0,,0,0",
    "MSG,3,1,1,50CC01,1,2024/05/01,10:00:01.000,2024/05/01,10:00:01.000,,4400,,,47.31,-1.71,,,0,,0,0",
    "garbage line",
    "MSG,1,1,1,50CC02,1,2024/05/01,10:00:02.000,2024/05/01,10:00:02.000,CALL12 ,,,,,,,,0,,0,0",
]


class _FeedHandler(socketserver.BaseRequestHandler):
    def handle(self):
        payload = ("\n".join(LINES) + "\n").encode()
        # dribble the feed like a live receiver
        for chunk in (payload[i : i + 40] for i in range(0, len(payload), 40)):
            self.request.sendall(chunk)
            time.sleep(0.01)
        time.sleep(30)  # keep the connection open while Spark reads


@pytest.fixture()
def feed_port():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _FeedHandler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_socket_stream_parses_live_feed(spark, feed_port, tmp_path):
    from dump1090_postgis_spark.operators.parse import parse_sbs1_lines
    from dump1090_postgis_spark.sources.sbs1 import socket_stream

    raw = socket_stream(spark, "127.0.0.1", feed_port)
    assert raw.isStreaming
    parsed = parse_sbs1_lines(raw)
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("sock_msgs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = time.time() + 60
    n = 0
    while time.time() < deadline:
        n = spark.sql("select * from sock_msgs").count()
        if n >= 3:
            break
        time.sleep(1)
    rows = spark.sql(
        "select hexident, transmission_type, callsign from sock_msgs"
    ).collect()
    q.stop()
    assert n >= 3  # garbage line gated out, 3 valid messages through
    by_hex = {(r.hexident, r.transmission_type): r for r in rows}
    assert ("50CC01", 3) in by_hex
    assert by_hex[("50CC02", 1)].callsign == "CALL12"
