"""csp.adapters.websocket parity (reference csp/adapters/websocket.py
WebsocketAdapterManager): a real RFC 6455 client adapter
(streaming/websocket.py — handshake, framing, ping/pong, reconnect)
plus the line-based socket source and in-memory push adapter
(GenericPushAdapter) for realtime tests."""
from ..streaming.sources import PushAdapter, PushGroup, socket_ticks
from ..streaming.websocket import (
    WebSocketClient, WebsocketAdapter, publish_websocket_stream,
)
from .websocket_table import (
    TableAdapter, TableManager, WebsocketTableAdapter, diff_dict,
)

__all__ = [
    "WebsocketAdapter", "WebSocketClient", "publish_websocket_stream",
    "socket_ticks", "PushAdapter", "PushGroup",
    "WebsocketTableAdapter", "TableAdapter", "TableManager", "diff_dict",
]


class WebsocketAdapterManager:
    """Reference calling convention (csp/adapters/websocket.py:390-460):
    one manager = one client connection config; ``subscribe(ts_type,
    msg_mapper, ...)`` yields the typed inbound edge, ``send(x)``
    publishes outbound ticks over the same connection,
    ``update_headers(x)`` mutates the handshake headers used at the
    next (re)connect, ``status()`` is the adapter status edge.

    Spark mapping: the inbound side rides streaming/websocket.py's
    WebsocketAdapter (the real RFC 6455 client thread landing messages
    into the capture-push channel); the MsgMapper decode + struct
    field_map/meta_field_map are the same Catalyst expressions the
    Kafka manager uses. The outbound side sends engine-ordered ticks
    as JSON text frames driver-side — the reference's own contract (a
    low-volume UI/control channel, not a bulk sink)."""

    def __init__(
        self,
        uri: str,
        reconnect_interval=None,
        headers: dict | None = None,
        spark=None,
    ):
        import datetime as _dt
        from urllib.parse import urlparse

        if reconnect_interval is None:
            reconnect_interval = _dt.timedelta(seconds=2)
        # the reference's construction rules (websocket.py:404-408)
        assert reconnect_interval >= _dt.timedelta(seconds=1)
        resp = urlparse(uri)
        if resp.hostname is None:
            raise ValueError(f"Failed to parse host from URI: {uri}")
        self._uri = uri
        self._properties = dict(
            host=resp.hostname,
            port=str(resp.port) if resp.port
            else ("443" if uri.startswith("wss") else "80"),
            route=resp.path or "/",
            use_ssl=uri.startswith("wss"),
            reconnect_interval=reconnect_interval,
            headers=dict(headers or {}),
        )
        self._reconnect_s = reconnect_interval.total_seconds()
        self._spark = spark
        self._adapter = None
        self._send_client = None

    # ------------------------------------------------------ lifecycle
    def _ensure_adapter(self, value_schema: str):
        if self._adapter is None:
            from ..core.session import get_spark
            from ..streaming.websocket import WebsocketAdapter

            spark = self._spark or get_spark()
            self._adapter = WebsocketAdapter(
                spark, self._uri, value_schema=value_schema,
                reconnect=self._reconnect_s,
            )
            self._adapter.client.headers.update(self._properties["headers"])
        return self._adapter

    def start(self):
        """Open the client thread (capture window begins)."""
        if self._adapter is not None:
            self._adapter.start()
        return self

    def stop(self):
        if self._adapter is not None:
            self._adapter.stop()
        if self._send_client is not None:
            self._send_client.close()
            self._send_client = None

    def join(self, timeout: float | None = None) -> bool:
        return self._adapter.join(timeout) if self._adapter else True

    # --------------------------------------------- realtime run path
    def _create(self, engine, memo):
        """reference websocket.py:458: the runtime adapter-manager
        impl. drive_captures builds it once per manager; every
        subscribe/status edge shares its reader thread."""
        return _WSManagerImpl(self)

    def _capture_entry(self, adapterimpl, out_type, push_mode):
        from ..core.surface import PushMode
        from ..impl.pushadapter import _PushStream, _value_ddl
        from ..plans.runtime import _run_info_stack

        frame = _run_info_stack[-1]
        groups = frame.setdefault("push_captures", [])
        entry = {
            "adapterimpl": adapterimpl,
            "args": (),
            "kwargs": {},
            "push_mode": push_mode or PushMode.NON_COLLAPSING,
            "adapter": None,
            "captured": False,
        }
        group = next(
            (g for g in groups
             if g.get("mgr") is self and not g.get("done")),
            None,
        )
        if group is None:
            group = {"mgr": self, "entries": []}
            groups.append(group)
        group["entries"].append(entry)
        ddl, elem = _value_ddl(out_type)
        return _PushStream(entry, ddl, elem)

    def _in_realtime_frame(self) -> bool:
        from ..plans.runtime import _run_info_stack

        return bool(_run_info_stack) and bool(
            _run_info_stack[-1].get("realtime")
        )

    # ------------------------------------------------------ subscribe
    def subscribe(
        self,
        ts_type: type,
        msg_mapper,
        field_map=None,
        meta_field_map: dict | None = None,
        push_mode=None,
    ):
        """Typed inbound edge (reference websocket.py:426-446): the
        landed JSON messages decoded per ``ts_type``'s schema with the
        {msg_field: struct_field} field_map; meta_field_map supports
        "timestamp" (message arrival time)."""
        from pyspark.sql import functions as F

        from ..core.record import Struct
        from ..core.ticks import KEY, SEQ, TS, VALUE, TickStream

        meta_field_map = meta_field_map or {}
        if isinstance(field_map, str):
            field_map = {field_map: ""}
        is_struct = isinstance(ts_type, type) and issubclass(ts_type, Struct)
        if not field_map and is_struct:
            field_map = {f: f for f in ts_type.__metadata__}
        if self._in_realtime_frame():
            # reference program shape: subscribe inside csp.run(
            # realtime=True) — the capture phase runs the manager's
            # client thread for the engine window, no manual start/stop
            raw = self._capture_entry(
                _ws_data_adapter, str, push_mode
            )
            if ts_type is str and not is_struct:
                return raw
            if is_struct:
                st = ts_type.spark_type()
                schema = ", ".join(
                    f"`{m}` {st[sf or m].dataType.simpleString()}"
                    for m, sf in (field_map or {}).items()
                )

                def _decode(df, schema=schema, fm=dict(field_map or {})):
                    d = msg_mapper.decode(F.col(VALUE), schema)
                    parts = {sf or m: d[m] for m, sf in fm.items()}
                    return df.select(
                        KEY, TS, SEQ,
                        F.struct(*[
                            c.alias(n) for n, c in parts.items()
                        ]).alias(VALUE),
                    )

                return _MappedStream(raw, _decode)
            raise TypeError(f"cannot subscribe with ts_type={ts_type!r}")
        if is_struct:
            # the decode schema describes the WIRE message: field_map
            # KEYS named with the mapped struct field's type
            st = ts_type.spark_type()
            schema = ", ".join(
                f"`{msg}` {st[sf or msg].dataType.simpleString()}"
                for msg, sf in field_map.items()
            )
        else:
            _ddl = {float: "double", int: "long", bool: "boolean",
                    str: "string"}
            schema = "value " + (
                ts_type if isinstance(ts_type, str)
                else _ddl.get(ts_type, "string")
            )
        ad = self._ensure_adapter(schema)
        raw = ad._push.out()  # (key, ts=arrival, seq, value=raw text)
        decoded = msg_mapper.decode(F.col(VALUE), schema)
        _META = {"timestamp": F.col(TS)}
        if is_struct:
            parts = {}
            for msg_field, struct_field in (field_map or {}).items():
                parts[struct_field or msg_field] = decoded[msg_field]
            for meta, struct_field in meta_field_map.items():
                if meta not in _META:
                    raise ValueError(f"unsupported meta field: {meta}")
                parts[struct_field] = _META[meta]
            value = F.struct(*[c.alias(n) for n, c in parts.items()])
        else:
            value = decoded["value"] if "value" in schema else decoded
        out = raw.select(
            F.col(KEY), F.col(TS), F.col(SEQ), value.alias(VALUE)
        )
        return TickStream(out)

    # ----------------------------------------------------------- send
    def send(self, x):
        """Publish a tick edge out over the connection (reference
        websocket.py:447-449): engine-ordered values serialized as
        JSON text frames. Batch edges send driver-side and return the
        number of frames; streaming frames ride
        publish_websocket_stream."""
        import json as _json

        from pyspark.sql import functions as F

        from ..core.ticks import SEQ, TS, VALUE
        from ..streaming.websocket import WebSocketClient

        df = x.df if hasattr(x, "df") else x
        if df.isStreaming:
            return publish_websocket_stream(df, self._uri)
        rows = (
            df.select(TS, SEQ, F.to_json(F.struct(VALUE)).alias("__j")
                      if dict(df.dtypes)[VALUE].startswith("struct")
                      else F.col(VALUE).cast("string").alias("__j"))
            .orderBy(TS, SEQ)
            .collect()
        )
        if self._send_client is None:
            self._send_client = WebSocketClient(
                self._uri, headers=self._properties["headers"]
            )
            self._send_client.connect()
        for r in rows:
            v = r["__j"]
            self._send_client.send_text(
                v if isinstance(v, str) else _json.dumps(v)
            )
        return len(rows)

    # -------------------------------------------------------- headers
    def update_headers(self, x):
        """Apply WebsocketHeaderUpdate ticks (reference
        websocket.py:450-452): header values take effect at the next
        (re)connect handshake."""
        from ..core.ticks import SEQ, TS, VALUE

        from pyspark.sql import Row

        df = x.df if hasattr(x, "df") else x
        # engine order: with several updates to the same header key,
        # last-tick-wins must mean (ts, seq)-last, not partition order
        for r in df.orderBy(TS, SEQ).select(VALUE).collect():
            v = r[VALUE]
            # a Row IS a tuple — test it before the list-of-updates case
            updates = [v] if isinstance(v, (Row, dict)) else (
                list(v) if isinstance(v, (list, tuple)) else [v]
            )
            for u in updates:
                if isinstance(u, str):
                    continue
                self._properties["headers"][u["key"]] = u["value"]
        if self._adapter is not None:
            self._adapter.client.headers.update(self._properties["headers"])
        if self._send_client is not None:
            self._send_client.headers.update(self._properties["headers"])
        return len(self._properties["headers"])

    def status(self, push_mode=None):
        if self._in_realtime_frame():
            from .status import Status

            return self._capture_entry(_ws_status_adapter, Status, push_mode)
        from ..impl.wiring.adapters import status_adapter_def

        return status_adapter_def(self)


__all__.append("WebsocketAdapterManager")


class _WSMemberPushAdapter:
    """One capture-channel member of a shared websocket manager impl:
    the impl's reader thread calls ``push_tick`` (inherited buffer +
    clock semantics); lifecycle belongs to the impl."""

    def __init__(self, impl, channel: str):
        # composition, not inheritance: drive_captures only needs the
        # push_tick/_csp_buffer/_csp_capture/start/stop shape
        self._csp_buffer: list = []
        self._csp_capture = None
        getattr(impl, channel).append(self)

    def push_tick(self, value) -> bool:
        cap = self._csp_capture
        if cap is None or not cap.active:
            return False
        ts, order = cap.stamp()
        self._csp_buffer.append((ts, order, value))
        return True

    def start(self, starttime, endtime):
        pass

    def stop(self):
        pass


def _ws_data_adapter(impl):
    return _WSMemberPushAdapter(impl, "_data")


def _ws_status_adapter(impl):
    return _WSMemberPushAdapter(impl, "_status")


class _WSManagerImpl:
    """Runtime half of WebsocketAdapterManager inside a realtime
    csp.run (the reference's _websocket_adapter_manager): ONE client
    reader thread per manager, routing raw messages to every data
    subscription and connect/error events to the status edges."""

    def __init__(self, mgr):
        import threading

        self._mgr = mgr
        self._data: list = []
        self._status: list = []
        self._stop_evt = threading.Event()
        self._thread: threading.Thread | None = None
        from ..streaming.websocket import WebSocketClient

        self.client = WebSocketClient(
            mgr._uri, headers=mgr._properties["headers"]
        )

    def _push_status(self, code: int, msg: str):
        from .status import Level, Status

        s = Status(
            level=int(Level.INFO if code == 0 else Level.ERROR),
            status_code=code, msg=msg,
        )
        for a in self._status:
            a.push_tick(s)

    def _run(self):
        while not self._stop_evt.is_set():
            try:
                self.client.connect()
                self._push_status(0, f"Connected to {self._mgr._uri}")
                while not self._stop_evt.is_set():
                    msg = self.client.recv_message()
                    if msg is None:
                        break
                    text = msg.decode("utf-8", errors="replace")
                    for a in self._data:
                        a.push_tick(text)
            except (OSError, ConnectionError) as e:
                if not self._stop_evt.is_set():
                    self._push_status(1, str(e))
            finally:
                self.client.close()
            self._stop_evt.wait(self._mgr._reconnect_s)

    def start(self, starttime, endtime):
        import threading

        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop_evt.set()
        self.client.close()
        if self._thread is not None:
            self._thread.join(timeout=10.0)


class _MappedStream:
    """Lazy df-transform over another lazy stream (a _PushStream whose
    buffer only exists after the capture phase)."""

    def __init__(self, base, fn):
        self._base = base
        self._fn = fn
        self._df_cache = None
        self.value_col = "value"

    @property
    def df(self):
        if self._df_cache is None:
            self._df_cache = self._fn(self._base.df)
        return self._df_cache

    def __getattr__(self, name):
        # TickStream's fluent surface over the mapped df
        from ..core.ticks import TickStream

        return getattr(TickStream(self.df, self.value_col), name)


# reference-parity module-scope TypeVars: ported programs do
# `from csp.adapters.websocket import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
