"""S2: live TCP feed end-to-end — a real socket server drips the golden
corpus, the socket-source chain decodes it (the reference's ingress tier,
ais_ingressServer.py, re-expressed as readStream)."""

from __future__ import annotations

import json
import os
import socket
import threading
import time

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "reference_decoded.json"))
)
TAG = "\\s:rSOCK,c:1673222400,i:X*32"


def _serve(server_sock: socket.socket, payload: bytes, done: threading.Event):
    conn, _ = server_sock.accept()
    conn.sendall(payload)
    done.wait(timeout=60)
    conn.close()


def test_socket_feed_decodes(spark):
    from pincspark.sources.nmea_source import read_socket_stream

    lines = "".join(
        TAG + s + "\n" for rec in GOLDEN for s in rec["sentences"]
    ).encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()
    t = threading.Thread(target=_serve, args=(srv, lines, done), daemon=True)
    t.start()

    decoded = read_socket_stream(spark, "127.0.0.1", port, timeout_ms=None)
    q = (
        decoded.select("ais.messageType", "ais.mmsi")
        .writeStream.format("memory")
        .queryName("sock_out")
        .outputMode("append")
        .start()
    )
    try:
        want = {(r["common"]["messageType"], r["common"]["mmsi"]) for r in GOLDEN}
        deadline = time.time() + 90
        got: set = set()
        while time.time() < deadline and got != want:
            time.sleep(1.0)
            got = {
                (r["messageType"], r["mmsi"])
                for r in spark.sql("SELECT * FROM sock_out").collect()
            }
        assert got == want
    finally:
        done.set()
        q.stop()
        srv.close()
