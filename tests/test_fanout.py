"""ST4/ST5: TCP fan-out sink adapter + heartbeat/Ping-Pong protocol ops."""

from __future__ import annotations

import socket
import time

import pytest

from pincspark.streaming.fanout import (
    TcpFanoutServer,
    fanout_sink,
    heartbeat_stream,
    ivef_pong,
)


def _recv_lines(sock: socket.socket, n: int, timeout: float = 10.0) -> list[str]:
    sock.settimeout(timeout)
    buf = b""
    deadline = time.time() + timeout
    while buf.count(b"\n") < n and time.time() < deadline:
        try:
            chunk = sock.recv(4096)
        except TimeoutError:
            break
        if not chunk:
            break
        buf += chunk
    return buf.decode("utf-8").splitlines()


def test_stream_fans_out_to_all_clients(spark, tmp_path):
    """ST4 e2e: a file stream dripped through foreachBatch reaches EVERY
    connected TCP subscriber, in batch order."""
    src = tmp_path / "feed"
    src.mkdir()
    lines = [f"msg-{i:04d}" for i in range(40)]
    (src / "a.txt").write_text("\n".join(lines[:20]) + "\n")

    server = TcpFanoutServer()
    port = server.start()
    c1 = socket.create_connection(("127.0.0.1", port))
    c2 = socket.create_connection(("127.0.0.1", port))
    for _ in range(50):
        if server.n_clients() == 2:
            break
        time.sleep(0.1)
    assert server.n_clients() == 2

    stream = spark.readStream.format("text").load(str(src)).withColumnRenamed(
        "value", "line"
    )
    q = (
        stream.writeStream.foreachBatch(fanout_sink(server))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b.txt").write_text("\n".join(lines[20:]) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    got1 = _recv_lines(c1, 40)
    got2 = _recv_lines(c2, 40)
    # per-client order preserved within batches; both see everything
    assert sorted(got1) == lines
    assert sorted(got2) == lines
    c1.close()
    c2.close()
    server.stop()


def test_slow_client_drops_oldest_never_blocks():
    """The reference's slow-consumer policy: a client that stops reading
    loses its OLDEST queued lines (counted), and broadcast never blocks."""
    server = TcpFanoutServer(max_queue=5)
    port = server.start()
    # connect but never read, and give the writer no chance to drain:
    # saturate the queue faster than one writer thread can send to a
    # zero-window socket
    c = socket.create_connection(("127.0.0.1", port))
    for _ in range(50):
        if server.n_clients() == 1:
            break
        time.sleep(0.1)
    t0 = time.time()
    server.broadcast([f"x{i}".encode() * 100000 for i in range(200)])
    assert time.time() - t0 < 5.0  # never blocked on the stuck client
    assert server.dropped > 0
    c.close()
    server.stop()


def test_heartbeat_stream_shape(spark):
    """ST5: the rate-derived heartbeat is a valid streaming frame with the
    (seq, hb_ts) contract."""
    hb = heartbeat_stream(spark, interval_seconds=1)
    assert hb.isStreaming
    assert [f.name for f in hb.schema.fields] == ["seq", "hb_ts"]
    q = (
        hb.writeStream.format("memory")
        .queryName("hb_out")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM hb_out").head()["c"]
            if n >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n >= 2
    rows = spark.sql("SELECT * FROM hb_out ORDER BY seq").collect()
    assert rows[0].seq == 0 and rows[1].seq == 1
    assert rows[0].hb_ts < rows[1].hb_ts


def test_ivef_pong_reply(spark):
    """The Ping->Pong reply echoes the ping's MsgRefId in ResponseOn,
    mints a fresh MsgRefId, and parses back as well-formed XML."""
    pings = spark.createDataFrame(
        [("{aaa-1}",), ("{bbb-2}",)], "msg_ref_id STRING"
    )
    pongs = ivef_pong(pings).collect()
    assert {r.response_on for r in pongs} == {"{aaa-1}", "{bbb-2}"}
    import xml.etree.ElementTree as ET

    refids = set()
    for r in pongs:
        root = ET.fromstring(r.pong_xml)
        header, body = root.find("Header"), root.find("Body")
        refids.add(header.get("MsgRefId"))
        pong = body.find("Pong")
        assert pong.get("ResponseOn") == r.response_on
        assert "T" in pong.get("TimeStamp")
    assert len(refids) == 2  # fresh uuid per reply


def _serve_lines(lines: list[str], stop_after: int | None = None):
    """One-shot upstream feed: sends `lines`, then (optionally) dies."""
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def _run():
        try:
            conn, _ = srv.accept()
            time.sleep(0.5)  # let the test's downstream client register with
            # the relay's fan server before lines flow (fan-out reaches only
            # already-connected subscribers)
            for i, ln in enumerate(lines):
                if stop_after is not None and i >= stop_after:
                    break
                conn.sendall((ln + "\n").encode())
                time.sleep(0.01)
            conn.close()
        except OSError:
            pass
        finally:
            srv.close()

    import threading

    threading.Thread(target=_run, daemon=True).start()
    return port


def test_failover_relay_rotates_hosts():
    """S4: the relay drains host A until it dies mid-stream, rotates to
    host B, and the DOWNSTREAM socket (what Spark consumes) sees one
    uninterrupted line stream across the failover."""
    from pincspark.streaming.fanout import FailoverRelay

    a_lines = [f"a-{i}" for i in range(10)]
    b_lines = [f"b-{i}" for i in range(10)]
    port_a = _serve_lines(a_lines, stop_after=10)  # dies after its 10
    port_b = _serve_lines(b_lines)
    relay = FailoverRelay(
        [("127.0.0.1", port_a), ("127.0.0.1", port_b)], retry_sleep=0.05
    )
    down_port = relay.start()
    c = socket.create_connection(("127.0.0.1", down_port))
    got = _recv_lines(c, 20, timeout=15.0)
    assert got[:10] == a_lines  # host A's stream, in order
    assert [l for l in got if l.startswith("b-")] == b_lines  # B after failover
    assert relay.connects >= 2  # a real reconnect happened
    c.close()
    relay.stop()


def test_failover_relay_skips_dead_first_host():
    """Connect failure on the first host rotates immediately (retry sleep,
    no stall) to the live one."""
    from pincspark.streaming.fanout import FailoverRelay

    dead = socket.create_server(("127.0.0.1", 0))
    dead_port = dead.getsockname()[1]
    dead.close()  # nothing listens here anymore
    live = _serve_lines([f"m-{i}" for i in range(5)])
    relay = FailoverRelay(
        [("127.0.0.1", dead_port), ("127.0.0.1", live)], retry_sleep=0.05
    )
    down = relay.start()
    c = socket.create_connection(("127.0.0.1", down))
    got = _recv_lines(c, 5, timeout=15.0)
    assert got == [f"m-{i}" for i in range(5)]
    c.close()
    relay.stop()


def test_failover_relay_rotates_on_idle_timeout():
    """The reference rotates after 30s of upstream silence; the relay
    reproduces it: a feed that stalls (without closing) is abandoned for
    the next host after idle_timeout."""
    import threading

    from pincspark.streaming.fanout import FailoverRelay

    stall_srv = socket.create_server(("127.0.0.1", 0))
    stall_port = stall_srv.getsockname()[1]

    def _stall():
        try:
            conn, _ = stall_srv.accept()
            time.sleep(0.5)
            conn.sendall(b"s-0\n")
            time.sleep(30)  # then silence, connection left OPEN
            conn.close()
        except OSError:
            pass

    threading.Thread(target=_stall, daemon=True).start()
    live = _serve_lines([f"l-{i}" for i in range(5)])
    relay = FailoverRelay(
        [("127.0.0.1", stall_port), ("127.0.0.1", live)],
        retry_sleep=0.05,
        idle_timeout=0.8,
    )
    down = relay.start()
    c = socket.create_connection(("127.0.0.1", down))
    got = _recv_lines(c, 6, timeout=20.0)
    assert got[0] == "s-0"
    assert got[1:] == [f"l-{i}" for i in range(5)]  # rotated off the stall
    assert relay.connects >= 2
    c.close()
    relay.stop()
    stall_srv.close()
