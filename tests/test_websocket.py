"""RFC 6455 WebSocket layer (streaming/websocket.py): handshake vector
from the RFC, frame codec round-trips (lengths, masking, fragmentation,
interleaved control), and a live-socket e2e against a raw stdlib client —
no websockets library anywhere."""

from __future__ import annotations

import os
import socket
import time

import pytest

from pincspark.streaming.websocket import (
    OP_BINARY,
    OP_CLOSE,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    FrameParser,
    WebSocketFanoutServer,
    accept_key,
    encode_frame,
)


def test_accept_key_rfc_vector():
    """RFC 6455 §1.3's worked example."""
    assert (
        accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


@pytest.mark.parametrize("n", [0, 1, 125, 126, 127, 65535, 65536, 70000])
def test_frame_roundtrip_lengths(n):
    payload = os.urandom(n)
    p = FrameParser()
    p.feed(encode_frame(payload, OP_BINARY))
    assert p.frames() == [(OP_BINARY, payload)]


def test_masked_frame_roundtrip():
    p = FrameParser()
    p.feed(encode_frame(b"hello", OP_TEXT, mask=b"\x01\x02\x03\x04"))
    assert p.frames() == [(OP_TEXT, b"hello")]


def test_fragmented_message_with_interleaved_ping():
    """§5.4: control frames may interleave a fragmented message; the
    fragments reassemble onto the initial opcode."""
    p = FrameParser()
    p.feed(encode_frame(b"hel", OP_TEXT, fin=False))
    p.feed(encode_frame(b"", OP_PING))
    p.feed(encode_frame(b"lo", 0x0, fin=True))  # continuation
    assert p.frames() == [(OP_PING, b""), (OP_TEXT, b"hello")]


def test_parser_survives_byte_dribble():
    frame = encode_frame(b"x" * 300, OP_TEXT, mask=b"abcd")
    p = FrameParser()
    for i in range(len(frame)):
        p.feed(frame[i : i + 1])
    assert p.frames() == [(OP_TEXT, b"x" * 300)]


# ---------------------------------------------------------------- e2e


class _RawClient:
    """Stdlib-only WebSocket client for the e2e tests."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=5)
        self.sock.sendall(
            b"GET / HTTP/1.1\r\n"
            b"Host: localhost\r\n"
            b"Upgrade: websocket\r\n"
            b"Connection: Upgrade\r\n"
            b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
            b"Sec-WebSocket-Version: 13\r\n\r\n"
        )
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.sock.recv(4096)
        head, rest = resp.split(b"\r\n\r\n", 1)
        assert b"101" in head.split(b"\r\n")[0]
        assert b"s3pPLMBiTxaQ9kYGzzhZRbK+xOo=" in head
        self.parser = FrameParser()
        if rest:
            self.parser.feed(rest)

    def send(self, payload: bytes, opcode: int) -> None:
        self.sock.sendall(encode_frame(payload, opcode, mask=b"\x0a\x0b\x0c\x0d"))

    def recv_frames(self, want: int, timeout: float = 5.0) -> list:
        got: list = []
        self.sock.settimeout(0.2)
        deadline = time.time() + timeout
        while len(got) < want and time.time() < deadline:
            got.extend(self.parser.frames())
            if len(got) >= want:
                break
            try:
                chunk = self.sock.recv(4096)
            except TimeoutError:
                continue
            if not chunk:
                break
            self.parser.feed(chunk)
        got.extend(self.parser.frames())
        return got


def _wait(pred, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return False


def test_e2e_broadcast_ping_pong_close():
    srv = WebSocketFanoutServer()
    port = srv.start()
    try:
        c1, c2 = _RawClient(port), _RawClient(port)
        assert _wait(lambda: srv.n_clients() == 2)

        # fan-out: both subscribers get the same text frames in order
        srv.broadcast([b'{"mmsi": 1}', b'{"mmsi": 2}'])
        for c in (c1, c2):
            assert c.recv_frames(2) == [
                (OP_TEXT, b'{"mmsi": 1}'),
                (OP_TEXT, b'{"mmsi": 2}'),
            ]

        # client ping -> server pong with the same payload
        c1.send(b"marco", OP_PING)
        assert (OP_PONG, b"marco") in c1.recv_frames(1)

        # server-initiated keepalive: ping via broadcast_frames, client
        # answers, server counts the pong
        srv.broadcast_frames([encode_frame(b"", OP_PING)])
        frames = c2.recv_frames(1)
        assert (OP_PING, b"") in frames
        c2.send(b"", OP_PONG)
        assert _wait(lambda: srv.pongs >= 1)

        # close handshake: echo + teardown (drain the broadcast ping that
        # also landed on c1 before the close reply)
        c1.send(b"", OP_CLOSE)
        assert (OP_CLOSE, b"") in c1.recv_frames(3, timeout=3.0)
        assert _wait(lambda: srv.n_clients() == 1)
    finally:
        srv.stop()


def test_e2e_non_websocket_client_rejected():
    srv = WebSocketFanoutServer()
    port = srv.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        resp = s.recv(4096)
        assert b"400" in resp
        assert srv.n_clients() == 0
    finally:
        srv.stop()


def test_e2e_server_ping_interval():
    srv = WebSocketFanoutServer(ping_interval=0.1)
    port = srv.start()
    try:
        c = _RawClient(port)
        assert _wait(lambda: srv.n_clients() == 1)
        frames = c.recv_frames(2, timeout=2.0)
        assert all(op == OP_PING for op, _ in frames) and len(frames) >= 2
    finally:
        srv.stop()


def test_stream_fans_out_json_over_websocket(spark, tmp_path):
    """The reference's serving tier e2e (ais_webSocketNmeaServer.py:
    decoded JSON pushed to every WebSocket subscriber): a file stream
    dripped through foreachBatch + to_json reaches every connected
    WebSocket client as one TEXT FRAME per record, through the real
    upgrade handshake and RFC 6455 framing."""
    import json

    from pyspark.sql import functions as F

    from pincspark.streaming.fanout import fanout_sink

    src = tmp_path / "feed"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(f"m{i}" for i in range(10)) + "\n")

    srv = WebSocketFanoutServer()
    port = srv.start()
    c1, c2 = _RawClient(port), _RawClient(port)
    assert _wait(lambda: srv.n_clients() == 2)

    stream = (
        spark.readStream.format("text")
        .load(str(src))
        .select(F.to_json(F.struct(F.col("value").alias("msg"))).alias("line"))
    )
    q = stream.writeStream.foreachBatch(fanout_sink(srv)).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    for c in (c1, c2):
        frames = c.recv_frames(10)
        assert len(frames) == 10
        assert all(op == OP_TEXT for op, _ in frames)
        msgs = sorted(json.loads(p.decode().strip())["msg"] for _, p in frames)
        assert msgs == sorted(f"m{i}" for i in range(10))
    srv.stop()
