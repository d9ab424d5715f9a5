"""WebSocket protocol adapter (RFC 6455 client).

Reference: csp/adapters/websocket.py:390-470 WebsocketAdapterManager —
a real WS client (HTTP upgrade handshake, frame decode, ping/pong,
reconnect) running on an adapter thread that pushes decoded messages
into the engine. This module is the Spark-native equivalent: a
stdlib-socket RFC 6455 client (no third-party WS library — the
protocol is ~150 lines) feeding the engine through the atomic
landing-directory push channel (streaming/sources.PushAdapter), so
each drained burst of frames becomes one microbatch. Message decode
(JSON field map) is the same MsgMapper form as kafka_ticks /
socket_ticks — the graph sees identical typed ticks in all three.

Protocol coverage: handshake key verification, 7/16/64-bit payload
lengths, client-side masking (mandatory per RFC 6455 §5.3),
fragmented messages (continuation frames), ping→pong, close
handshake, and an optional reconnect loop (the reference's
`reconnect_interval`).
"""

from __future__ import annotations

import base64 as _b64
import datetime as _dt
import hashlib as _hashlib
import os as _os
import socket as _socket
import struct as _struct
import threading as _threading
from typing import Callable
from urllib.parse import urlparse as _urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.ticks import GLOBAL_KEY, KEY, SEQ, TS, VALUE
from .sources import PushAdapter

#: RFC 6455 §1.3 handshake GUID
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10


def _accept_key(key: str) -> str:
    """Sec-WebSocket-Accept for a Sec-WebSocket-Key (RFC 6455 §4.2.2)."""
    digest = _hashlib.sha1((key + _WS_GUID).encode()).digest()
    return _b64.b64encode(digest).decode()


def encode_frame(opcode: int, payload: bytes, mask: bool = True,
                 fin: bool = True) -> bytes:
    """Serialize one frame. Clients MUST mask (RFC 6455 §5.3); servers
    MUST NOT — the test harness reuses this with mask=False."""
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < (1 << 16):
        head += bytes([mask_bit | 126]) + _struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + _struct.pack(">Q", n)
    if not mask:
        return head + payload
    key = _os.urandom(4)
    body = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return head + key + body


def _read_exact(sock: _socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


def _parse_frame(read) -> tuple[bool, int, bytes]:
    """Decode one frame through a ``read(n) -> bytes`` callable →
    (fin, opcode, unmasked payload)."""
    b0, b1 = read(2)
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        (n,) = _struct.unpack(">H", read(2))
    elif n == 127:
        (n,) = _struct.unpack(">Q", read(8))
    key = read(4) if masked else None
    payload = read(n) if n else b""
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return fin, opcode, payload


def read_frame(sock: _socket.socket) -> tuple[bool, int, bytes]:
    """Read one frame straight off a socket (unbuffered — the test
    server path; the client reads through its handshake-leftover
    buffer instead)."""
    return _parse_frame(lambda n: _read_exact(sock, n))


class WebSocketClient:
    """Minimal RFC 6455 client over a stdlib socket.

    ``recv_message()`` returns the next complete TEXT/BINARY message
    (reassembling fragments), transparently answering pings and
    completing the close handshake (returns None on close)."""

    def __init__(self, uri: str, timeout: float | None = 30.0,
                 headers: dict | None = None):
        u = _urlparse(uri)
        if u.scheme not in ("ws",):  # wss needs TLS wrapping — out of scope
            raise ValueError(f"unsupported scheme {u.scheme!r} (use ws://)")
        self._host = u.hostname or "localhost"
        self._port = u.port or 80
        self._path = u.path or "/"
        if u.query:
            self._path += "?" + u.query
        self._timeout = timeout
        #: extra handshake request headers (reference
        #: WebsocketAdapterManager(headers=...)); mutable — header
        #: updates apply at the next (re)connect handshake
        self.headers: dict = dict(headers or {})
        self._sock: _socket.socket | None = None
        self._buf = b""  # bytes received beyond the handshake response

    def connect(self) -> None:
        sock = _socket.create_connection(
            (self._host, self._port), timeout=self._timeout
        )
        key = _b64.b64encode(_os.urandom(16)).decode()
        extra = "".join(f"{k}: {v}\r\n" for k, v in self.headers.items())
        req = (
            f"GET {self._path} HTTP/1.1\r\n"
            f"Host: {self._host}:{self._port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n"
            f"{extra}\r\n"
        )
        sock.sendall(req.encode())
        # read the HTTP response head; anything past the blank line is
        # already frame data (a fast server sends immediately after the
        # 101) — keep it buffered, never discard
        head = b""
        while b"\r\n\r\n" not in head:
            chunk = sock.recv(4096)
            if not chunk:
                raise ConnectionError("handshake: peer closed")
            head += chunk
        head, _, self._buf = head.partition(b"\r\n\r\n")
        status, _, rest = head.partition(b"\r\n")
        if b"101" not in status:
            raise ConnectionError(f"handshake rejected: {status.decode(errors='replace')}")
        headers = {}
        for line in rest.split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        accept = headers.get(b"sec-websocket-accept", b"").decode()
        if accept != _accept_key(key):
            raise ConnectionError("handshake: bad Sec-WebSocket-Accept")
        self._sock = sock

    def _recv_exact(self, n: int) -> bytes:
        """Buffered read: serve from the handshake leftover first.
        A concurrent close() (stop() from another thread) nulls
        ``_sock`` — surface that as ConnectionError so the reader
        loop's normal disconnect handling applies, never an
        AttributeError escaping the adapter thread."""
        while len(self._buf) < n:
            sock = self._sock
            if sock is None:
                raise ConnectionError("websocket closed")
            chunk = sock.recv(max(4096, n - len(self._buf)))
            if not chunk:
                raise ConnectionError("websocket peer closed mid-frame")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def send_text(self, text: str) -> None:
        sock = self._sock
        if sock is None:
            raise ConnectionError("websocket closed")
        sock.sendall(encode_frame(OP_TEXT, text.encode(), mask=True))

    def recv_message(self) -> bytes | None:
        """Next complete data message; None once the peer closes."""
        if self._sock is None:
            raise ConnectionError("websocket closed")
        buf = b""
        while True:
            fin, opcode, payload = _parse_frame(self._recv_exact)
            sock = self._sock
            if sock is None:
                raise ConnectionError("websocket closed")
            if opcode == OP_PING:  # §5.5.2-3: answer with same payload
                sock.sendall(encode_frame(OP_PONG, payload, mask=True))
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:  # §5.5.1: echo the close, report EOS
                try:
                    sock.sendall(encode_frame(OP_CLOSE, payload, mask=True))
                except OSError:
                    pass
                return None
            buf += payload
            if fin:
                return buf

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.sendall(encode_frame(OP_CLOSE, b"", mask=True))
            except OSError:
                pass
            try:
                self._sock.close()
            finally:
                self._sock = None


def publish_websocket_stream(
    x: DataFrame,
    uri: str,
    checkpoint_dir: str | None = None,
):
    """WebsocketAdapterManager.publish parity (the outbound half of
    csp/adapters/websocket.py): each streaming row is serialized to a
    JSON text frame and sent over ONE RFC 6455 client connection per
    microbatch via foreachBatch (rows collected per batch — websocket
    publishing is a low-volume control/UI channel by nature, not a
    bulk sink; bulk egress belongs to Kafka/parquet sinks). Returns
    the StreamingQuery."""
    from pyspark.sql import functions as FF

    def _send_batch(batch_df, batch_id):
        rows = batch_df.select(
            FF.to_json(FF.struct(*batch_df.columns)).alias("j")
        ).collect()
        if not rows:
            return
        client = WebSocketClient(uri)
        client.connect()
        try:
            for r in rows:
                client.send_text(r["j"])
        finally:
            client.close()

    writer = x.writeStream.foreachBatch(_send_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


class WebsocketAdapter:
    """WebsocketAdapterManager parity (csp/adapters/websocket.py:390-470):
    a client thread reads WS messages and pushes them into the engine;
    ``subscribe()`` yields the typed tick stream.

    Each drained message lands through the PushAdapter channel
    (value = raw text); ``subscribe`` applies the JSON MsgMapper field
    map (same as kafka_ticks / socket_ticks). ``on_message`` hooks raw
    payloads (the reference's raw callback). ``reconnect`` > 0 retries
    the connection after a drop, like the reference's reconnect loop;
    0/None stops the thread on first disconnect."""

    def __init__(
        self,
        spark: SparkSession,
        uri: str,
        value_schema: str,
        ts_field: str | None = None,
        value_field: str = "value",
        key_field: str | None = None,
        reconnect: float | None = None,
        flush_every: int = 32,
        on_message: Callable[[bytes], None] | None = None,
    ):
        self._spark = spark
        self._uri = uri
        self._value_schema = value_schema
        self._ts_field = ts_field
        self._value_field = value_field
        self._key_field = key_field
        self._reconnect = reconnect
        self._flush_every = max(1, flush_every)
        self._on_message = on_message
        self._push = PushAdapter(spark, value_type="string")
        self._thread: _threading.Thread | None = None
        self._stop = _threading.Event()
        self.client = WebSocketClient(uri)

    # ------------------------------------------------------ lifecycle
    def start(self) -> "WebsocketAdapter":
        self._thread = _threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                self.client.connect()
                pending = 0
                while not self._stop.is_set():
                    msg = self.client.recv_message()
                    if msg is None:
                        break
                    if self._on_message is not None:
                        self._on_message(msg)
                    self._push.push_tick(msg.decode("utf-8", errors="replace"))
                    pending += 1
                    if pending >= self._flush_every:
                        self._push.flush()
                        pending = 0
                if pending:
                    self._push.flush()
            except (OSError, ConnectionError):
                pass
            finally:
                self.client.close()
            if not self._reconnect:
                break
            self._stop.wait(self._reconnect)
        self._push.flush()

    def flush(self) -> int:
        return self._push.flush()

    def join(self, timeout: float | None = None) -> bool:
        """Wait for the client thread to finish draining (it exits on
        server close when reconnect is off). Returns True if done —
        call before stop() for a loss-free shutdown."""
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            return not self._thread.is_alive()
        return True

    def stop(self, join_timeout: float = 10.0) -> None:
        self._stop.set()
        self.client.close()
        if self._thread is not None:
            self._thread.join(timeout=join_timeout)
        self._push.flush()
        self._push.stop()

    # ------------------------------------------------------ the graph
    def subscribe(self) -> DataFrame:
        """Typed tick stream from the landed messages — identical
        MsgMapper decode to socket_ticks; ts_field=None stamps arrival
        time (the landing row's push timestamp)."""
        raw = self._push.out()
        parsed = raw.select(
            F.col(TS).alias("__arrival"),
            F.col(SEQ),
            F.from_json(F.col(VALUE), self._value_schema).alias("v"),
        )
        ts_expr = (
            F.col(f"v.{self._ts_field}").cast("timestamp")
            if self._ts_field
            else F.col("__arrival")
        )
        key_expr = (
            F.col(f"v.{self._key_field}").cast("string")
            if self._key_field
            else F.lit(GLOBAL_KEY)
        )
        return parsed.select(
            key_expr.alias(KEY),
            ts_expr.alias(TS),
            F.col(SEQ),
            F.col(f"v.{self._value_field}").alias(VALUE),
        )
