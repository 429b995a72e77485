"""ST4/ST5 — continuous fan-out and heartbeat, Spark-side.

Reference behavior: ``ais_ingressServer.py:96-102`` pushes every record to
every connected TCP client via per-client queues (slow consumers drop,
never block the pipeline); ``ais_webSocketNmeaServer.py:328-335`` pings
subscribers on a fixed interval; ``ais_ivef.py:361-374`` answers an IVEF
``Ping`` with a ``Pong`` carrying a fresh MsgRefId, ``ResponseOn`` = the
ping's MsgRefId, and the current timestamp.

Spark-first shape:
- The CLUSTER-SCALE egress path is ``writeStream`` to Kafka (or any
  built-in sink) — pub/sub belongs to the broker at 100 TB.
- :class:`TcpFanoutServer` + :func:`fanout_sink` are the PROTOCOL-PARITY
  adapter for the reference's direct-TCP subscribers: a ``foreachBatch``
  bridge that broadcasts each micro-batch to every connected client
  through bounded per-client queues with drop-oldest overflow — the
  reference's slow-consumer policy, made explicit and counted. Fan-out
  necessarily converges on the driver (clients connect to ONE endpoint);
  the adapter is for the egress stream (decoded, filtered, bounded), not
  raw corpus data.
- :func:`heartbeat_stream` derives the keepalive ticks from Spark's rate
  source; :func:`ivef_pong` is the Ping->Pong reply as a DataFrame
  transform (usable in batch and streaming alike).
"""

from __future__ import annotations

import queue
import socket
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TcpFanoutServer:
    """Minimal threaded TCP pub server: accepts clients, gives each a
    bounded queue drained by its own writer thread. ``broadcast`` never
    blocks on a slow client — its oldest queued lines are dropped and
    counted (``dropped``), mirroring the reference's per-client asyncio
    queues."""

    def __init__(self, host: str = "127.0.0.1", max_queue: int = 1000):
        self._host = host
        self._max_queue = max_queue
        self._clients: dict[int, queue.Queue] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._stop = threading.Event()
        self.dropped = 0
        self._srv: socket.socket | None = None
        self.port: int | None = None

    def start(self) -> int:
        self._srv = socket.create_server((self._host, 0))
        self._srv.settimeout(0.2)
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self.port

    def _on_connect(self, conn: socket.socket) -> bool:
        """Per-connection setup hook (e.g. a protocol handshake). Return
        False to reject the client. Default: plain TCP, accept as-is."""
        return True

    def _frame(self, line: bytes) -> bytes:
        """Wire-format hook applied per line in the writer (e.g. RFC 6455
        framing in :class:`websocket.WebSocketFanoutServer`)."""
        return line

    def _on_client_registered(
        self, cid: int, conn: socket.socket, q: queue.Queue
    ) -> None:
        """Post-registration hook: the client's queue exists and its writer
        is running. Protocol layers start their per-client reader here (it
        needs ``q`` to signal the writer — a ``None`` put tears the client
        down through the writer's normal exit path)."""

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                break
            try:
                if not self._on_connect(conn):
                    conn.close()
                    continue
            except OSError:
                conn.close()
                continue
            q: queue.Queue = queue.Queue(maxsize=self._max_queue)
            with self._lock:
                cid = self._next_id
                self._next_id += 1
                self._clients[cid] = q
            threading.Thread(
                target=self._writer_loop, args=(cid, conn, q), daemon=True
            ).start()
            self._on_client_registered(cid, conn, q)

    def _writer_loop(self, cid: int, conn: socket.socket, q: queue.Queue) -> None:
        try:
            while not self._stop.is_set():
                try:
                    line = q.get(timeout=0.2)
                except queue.Empty:
                    continue
                if line is None:
                    break
                conn.sendall(self._frame(line))
        except OSError:
            pass
        finally:
            with self._lock:
                self._clients.pop(cid, None)
            conn.close()

    def n_clients(self) -> int:
        with self._lock:
            return len(self._clients)

    def broadcast(self, lines: list[bytes]) -> None:
        with self._lock:
            queues = list(self._clients.values())
        dropped = 0
        for q in queues:
            for line in lines:
                while True:
                    try:
                        q.put_nowait(line)
                        break
                    except queue.Full:
                        try:
                            q.get_nowait()  # drop-oldest, never block
                            dropped += 1
                        except queue.Empty:
                            break
        if dropped:
            # += under the lock: concurrent broadcasters (FailoverRelay +
            # a foreachBatch sink sharing one server) would lose
            # increments on a bare non-atomic += (ADVICE r5 #4).
            with self._lock:
                self.dropped += dropped

    def stop(self) -> None:
        self._stop.set()
        with self._lock:
            for q in self._clients.values():
                try:
                    q.put_nowait(None)
                except queue.Full:
                    pass
        if self._srv is not None:
            self._srv.close()


def fanout_sink(server: TcpFanoutServer, line_col: str = "line"):
    """``foreachBatch`` function broadcasting ``line_col`` of each
    micro-batch (newline-terminated, batch order preserved) to every
    connected client. The egress stream's rows converge on the driver by
    necessity — subscribers connect to one endpoint; use the Kafka sink
    for brokered cluster-scale pub/sub."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        lines = [
            (r[line_col] + "\n").encode("utf-8")
            for r in batch_df.select(line_col).collect()
            if r[line_col] is not None
        ]
        if lines:
            server.broadcast(lines)

    return _fn


def heartbeat_stream(
    spark: SparkSession, interval_seconds: int = 30
) -> DataFrame:
    """ST5 keepalive ticks as a streaming DataFrame (rate source -> one
    heartbeat row per interval): (seq, hb_ts). Union/join into an egress
    stream, or write through :func:`fanout_sink` directly."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
    )
    return (
        rate.filter(F.col("value") % interval_seconds == 0)
        .select(
            (F.col("value") / interval_seconds).cast("bigint").alias("seq"),
            F.col("timestamp").alias("hb_ts"),
        )
    )


def ivef_pong(pings: DataFrame, ref_id_col: str = "msg_ref_id") -> DataFrame:
    """The IVEF Ping->Pong protocol reply as a transform: one Pong
    MSG_IVEF document per ping, with a fresh MsgRefId (uuid), ResponseOn
    echoing the ping's MsgRefId, and the current timestamp — the
    reference's ``sent_heartbeats`` reply (``ais_ivef.py:361-374``),
    engine-side and streaming-safe."""
    return pings.select(
        F.col(ref_id_col).alias("response_on"),
        F.concat(
            F.lit('<MSG_IVEF><Header MsgRefId="{'),
            F.expr("uuid()"),
            F.lit('}" Version="0.2.5" /><Body><Pong ResponseOn="'),
            F.col(ref_id_col),
            F.lit('" TimeStamp="'),
            F.date_format(
                F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
            ),
            F.lit('" /></Body></MSG_IVEF>'),
        ).alias("pong_xml"),
    )


class FailoverRelay:
    """S4 — multi-host failover + reconnect as a transport adapter.

    The reference's ingress rotates its upstream target on timeout/error
    with a retry sleep (``ais_ingressServer.py:50-66,113-144``). Spark's
    socket source cannot do that itself (one fixed host per query), so the
    relay reproduces the reference's architecture: a connector thread
    dials the FIRST REACHABLE of ``hosts`` (rotating on connect failure,
    EOF, error, or ``idle_timeout`` seconds of silence, sleeping
    ``retry_sleep`` between attempts) and forwards complete lines to one
    STABLE local listening socket that ``read_socket_stream`` consumes —
    upstream churn is invisible to the streaming query. ``connects``
    counts upstream (re)connections. Production note: at cluster scale
    the feed belongs behind Kafka; this adapter is protocol parity for
    the reference's direct-TCP deployments."""

    def __init__(
        self,
        hosts: list[tuple[str, int]],
        retry_sleep: float = 0.2,
        idle_timeout: float = 30.0,
    ):
        self._hosts = list(hosts)
        self._retry_sleep = retry_sleep
        self._idle_timeout = idle_timeout
        self._stop = threading.Event()
        self._fan = TcpFanoutServer()
        self.connects = 0
        self.port: int | None = None

    def start(self) -> int:
        self.port = self._fan.start()
        threading.Thread(target=self._connector_loop, daemon=True).start()
        return self.port

    def _connector_loop(self) -> None:
        import time as _time

        i = 0
        while not self._stop.is_set():
            host, port = self._hosts[i % len(self._hosts)]
            i += 1
            try:
                up = socket.create_connection((host, port), timeout=2.0)
            except OSError:
                _time.sleep(self._retry_sleep)
                continue
            self.connects += 1
            up.settimeout(self._idle_timeout)
            buf = b""
            try:
                while not self._stop.is_set():
                    chunk = up.recv(4096)
                    if not chunk:
                        break  # upstream EOF -> rotate
                    buf += chunk
                    while b"\n" in buf:
                        line, buf = buf.split(b"\n", 1)
                        self._fan.broadcast([line + b"\n"])
            except OSError:
                pass  # timeout/reset -> rotate
            finally:
                up.close()
            _time.sleep(self._retry_sleep)

    def stop(self) -> None:
        self._stop.set()
        self._fan.stop()
