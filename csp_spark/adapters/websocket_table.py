"""WebsocketTableAdapter — live row-delta table publishing.

Reference: csp/adapters/websocket.py:62-387 (TableManager /
TableAdapter / WebsocketTableAdapter over tornado). Same wire
protocol, rebuilt on the repo's stdlib RFC 6455 stack
(streaming/websocket.py) with no tornado dependency:

- ``GET /tables``            → ``{"tables": [{name, index, schema,
  sub}, ...]}``
- ``GET /snap/<table>``      → ``{"snap": [row, ...]}``
- ``WS  /subscribe/<table>`` → snapshot chunks ``{"messageType":
  "snap", "data": [...], "messageID": n}`` then live ``{"messageType":
  "upd", "data": [row], "messageID": n}`` frames.

Indexed tables keep one snapshot row per index value; with
``delta_updates=True`` an update frame carries only the fields that
changed (reference diff_dict semantics, NaN-equality included).

Spark shape: tick delivery is driver-side and engine-ordered (a UI
control channel, like the reference's tornado loop on the engine
process — NOT a bulk egress path; that's Kafka/parquet). Publishing
inside a ``csp.run`` delivers on engine stop; ``publish_stream``
hooks a Structured Streaming query's microbatches via foreachBatch.
"""

from __future__ import annotations

import json
import math
import socket as _socket
import threading
from typing import Any

from pyspark.sql import functions as F

from ..core.ticks import KEY, SEQ, TS, TickStream

__all__ = ["WebsocketTableAdapter", "TableAdapter", "TableManager", "diff_dict"]

_UNSET = object()


def diff_dict(old: dict, new: dict) -> dict:
    """Fields of ``new`` that differ from ``old`` (reference
    websocket.py:51-59 — equal NaNs count as unchanged)."""
    d = {}
    for k, v in new.items():
        oldv = old.get(k, _UNSET)
        if v != oldv and (
            not isinstance(oldv, float)
            or not isinstance(v, float)
            or not math.isnan(v)
            or not math.isnan(oldv)
        ):
            d[k] = v
    return d


_TYPEMAP = {
    "string": "string",
    "double": "float",
    "float": "float",
    "bigint": "integer",
    "int": "integer",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
}


class TableAdapter:
    """One published table (reference websocket.py:312-357): don't
    construct directly — ``WebsocketTableAdapter.create_table``."""

    def __init__(self, name: str, index: str | None):
        self.name = name
        self.index = index
        self.columns: dict[str, TickStream] = {}
        self.schema: dict[str, str] = {}

    def publish(self, value: TickStream, field_map=None) -> None:
        """Publish a stream onto this table: a struct stream fans out
        one column per field (``field_map`` renames), a scalar stream
        needs ``field_map`` as the column-name string."""
        dt = value.df.schema[value.value_col].dataType
        if dt.typeName() == "struct":
            fm = dict(field_map) if field_map else {
                f.name: f.name for f in dt.fields
            }
            for field, col in fm.items():
                self._publish_field(
                    TickStream(
                        value.df.select(
                            KEY, TS, SEQ,
                            F.col(f"{value.value_col}.{field}").alias("value"),
                        )
                    ),
                    col,
                )
            return
        if not isinstance(field_map, str):
            raise TypeError(
                "Expected type str for field_map on single column "
                f"publish, got {type(field_map)}"
            )
        self._publish_field(value, field_map)

    def _publish_field(self, value: TickStream, column_name: str) -> None:
        if column_name in self.columns:
            raise KeyError(
                f"Trying to add column {column_name} more than once"
            )
        self.columns[column_name] = value
        ddl = dict(value.df.dtypes)[value.value_col]
        self.schema[column_name] = _TYPEMAP.get(ddl, "string")


class TableManager:
    """Snapshots + subscriber fanout (reference websocket.py:62-116)."""

    def __init__(self, tables: dict, delta_updates: bool):
        # `tables` is the adapter's live dict — tables created after
        # the manager exists still register; per-table state attaches
        # lazily under the lock
        self._tables = tables
        self._snapshots: dict[str, Any] = {}
        self._subscriptions: dict[str, set] = {}
        self._delta_updates = delta_updates
        self._lock = threading.Lock()

    def _snapshot_of(self, name: str):
        return self._snapshots.setdefault(
            name, {} if self._tables[name].index else []
        )

    def __iter__(self):
        return iter(self._tables.values())

    def __contains__(self, name):
        return name in self._tables

    def subscribe(self, table: str, conn) -> None:
        with self._lock:
            self._subscriptions.setdefault(table, set()).add(conn)

    def unsubscribe(self, conn) -> None:
        with self._lock:
            for sub in self._subscriptions.values():
                sub.discard(conn)

    def send_updates(self, tablename: str, data: dict) -> None:
        table = self._tables[tablename]
        with self._lock:
            snapshot = self._snapshot_of(tablename)
            if table.index is not None:
                index = data[table.index]
                old = snapshot.setdefault(index, {})
                if self._delta_updates:
                    data = diff_dict(old, data)
                    data[table.index] = index
                old.update(data)
            else:
                snapshot.append(data)
                limit = getattr(table, "limit", None)
                if limit is not None and len(snapshot) > limit:
                    # perspective Table(limit=) ring semantics: the
                    # snapshot keeps only the newest `limit` rows
                    del snapshot[:-limit]
            subs = list(self._subscriptions.get(tablename, ()))
        msg = {"messageType": "upd", "data": [data]}
        for conn in subs:
            try:
                conn.send(msg)
            except OSError:
                self.unsubscribe(conn)

    def clear(self, tablename: str) -> None:
        """Drop a table's snapshot (perspective Table.clear)."""
        with self._lock:
            self._snapshots.pop(tablename, None)

    def get_snapshot(self, tablename: str):
        with self._lock:
            snap = self._snapshot_of(tablename)
            return (
                list(snap.values()) if isinstance(snap, dict) else list(snap)
            )


def _json(o: Any) -> str:
    return json.dumps(o, default=str).replace("NaN", "null")


class _WsConn:
    """One subscribed websocket peer (server side, unmasked frames)."""

    def __init__(self, sock: _socket.socket):
        self._sock = sock
        self._seq = 0
        self._lock = threading.Lock()

    def send(self, data: dict) -> None:
        from ..streaming.websocket import encode_frame

        with self._lock:
            data = dict(data)
            data["messageID"] = self._seq
            self._seq += 1
            self._sock.sendall(
                encode_frame(0x1, _json(data).encode(), mask=False)
            )


class _TableServer(threading.Thread):
    """Minimal HTTP + RFC 6455 listener serving the three endpoints."""

    daemon = True

    def __init__(self, port: int, manager: TableManager):
        super().__init__(name=f"csp-ws-table:{port}")
        self._manager = manager
        self._srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
        self._srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            try:
                self._srv.settimeout(0.2)
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                break
            threading.Thread(
                target=self._serve_one, args=(conn,), daemon=True
            ).start()

    def close(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass

    # ------------------------------------------------- per-connection
    def _serve_one(self, conn: _socket.socket) -> None:
        try:
            head = b""
            conn.settimeout(10)
            while b"\r\n\r\n" not in head:
                chunk = conn.recv(4096)
                if not chunk:
                    return
                head += chunk
            request, _, _ = head.partition(b"\r\n\r\n")
            lines = request.split(b"\r\n")
            method, path, _ = lines[0].decode().split(" ", 2)
            headers = {}
            for ln in lines[1:]:
                k, _, v = ln.decode().partition(":")
                headers[k.strip().lower()] = v.strip()
            if headers.get("upgrade", "").lower() == "websocket":
                self._serve_ws(conn, path, headers)
            else:
                self._serve_http(conn, method, path)
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _http_resp(self, conn, status: str, body: str) -> None:
        payload = body.encode()
        conn.sendall(
            (
                f"HTTP/1.1 {status}\r\n"
                "Content-Type: application/json\r\n"
                "Access-Control-Allow-Origin: *\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "Connection: close\r\n\r\n"
            ).encode()
            + payload
        )

    def _serve_http(self, conn, method: str, path: str) -> None:
        if method != "GET":
            self._http_resp(conn, "405 Method Not Allowed", "{}")
            return
        if path == "/tables":
            data = {
                "tables": [
                    {
                        "name": t.name,
                        "index": t.index,
                        "schema": t.schema,
                        "sub": (
                            f"ws://127.0.0.1:{self.port}/subscribe/{t.name}"
                        ),
                    }
                    for t in self._manager
                ]
            }
            self._http_resp(conn, "200 OK", _json(data))
            return
        if path.startswith("/snap/"):
            table = path[len("/snap/"):]
            if table not in self._manager:
                self._http_resp(conn, "404 Not Found", "{}")
                return
            self._http_resp(
                conn, "200 OK",
                _json({"snap": self._manager.get_snapshot(table)}),
            )
            return
        self._http_resp(conn, "404 Not Found", "{}")

    def _serve_ws(self, conn, path: str, headers: dict) -> None:
        from ..streaming.websocket import _accept_key, read_frame

        if not path.startswith("/subscribe/"):
            self._http_resp(conn, "404 Not Found", "{}")
            return
        table = path[len("/subscribe/"):]
        if table not in self._manager:
            self._http_resp(conn, "404 Not Found", "{}")
            return
        key = headers.get("sec-websocket-key", "")
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
            ).encode()
        )
        ws = _WsConn(conn)
        # snapshot first (chunks of 100), then live updates
        snap = self._manager.get_snapshot(table)
        for i in range(0, len(snap), 100):
            ws.send({"messageType": "snap", "data": snap[i:i + 100]})
        self._manager.subscribe(table, ws)
        conn.settimeout(None)
        try:
            while not self._stop.is_set():
                fin, opcode, _ = read_frame(conn)
                if opcode == 0x8:  # close
                    break
        except OSError:
            pass
        finally:
            self._manager.unsubscribe(ws)


class WebsocketTableAdapter:
    """Reference WebsocketTableAdapter (websocket.py:359-387): create
    tables, publish streams onto their columns, serve snapshots +
    row-delta updates to websocket subscribers.

    ``start()`` binds the listener (``port=0`` picks a free port, see
    ``.port``); publishing inside a ``csp.run`` delivers all ticks in
    engine order on engine stop (the batch analog of the reference's
    per-cycle _apply_updates node); ``flush()`` delivers explicitly
    outside a run."""

    def __init__(self, port: int, delta_updates: bool = False):
        self._port = port
        self._delta_updates = delta_updates
        self._tables: dict[str, TableAdapter] = {}
        self._manager: TableManager | None = None
        self._server: _TableServer | None = None
        self._armed = False

    def copy(self) -> "WebsocketTableAdapter":
        res = WebsocketTableAdapter(self._port, self._delta_updates)
        res._tables.update(self._tables)
        return res

    def create_table(self, name: str, index: str | None = None) -> TableAdapter:
        if name in self._tables:
            raise ValueError(f"Table {name} already exists")
        table = self._tables[name] = TableAdapter(name, index)
        self._arm()
        return table

    # --------------------------------------------------- lifecycle
    @property
    def manager(self) -> TableManager:
        if self._manager is None:
            self._manager = TableManager(self._tables, self._delta_updates)
        return self._manager

    @property
    def port(self) -> int:
        if self._server is None:
            raise RuntimeError("server not started")
        return self._server.port

    def start(self) -> "WebsocketTableAdapter":
        if self._server is None:
            self._server = _TableServer(self._port, self.manager)
            self._server.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            self._server = None

    def _arm(self) -> None:
        if self._armed:
            return
        try:
            from ..plans.runtime import _run_info_stack, schedule_on_engine_stop

            if _run_info_stack:
                self._armed = True
                # the engine stops at endtime: ticks a delayed stream
                # carries past the run window must never be delivered
                # (reference engine semantics) — clip at flush
                frame = _run_info_stack[-1]
                self._clip = (frame.get("start"), frame.get("end"))
                schedule_on_engine_stop(self.flush)
        except Exception:
            pass

    # --------------------------------------------------- delivery
    def _table_rows(self, table: TableAdapter) -> list[dict]:
        """Engine-ordered cycle updates for one table: full-outer join
        the column streams on (key, ts, seq) — one update dict of the
        fields that ticked per engine cycle."""
        from functools import reduce

        # data columns ride internal aliases: a published field named
        # key/ts/seq (e.g. e2_websocket_output's MyData.key index
        # column) must not shadow the engine columns in the join
        names = list(table.columns)
        chan = {c: f"__c{i}" for i, c in enumerate(names)}
        frames = [
            s.df.select(KEY, TS, SEQ, F.col(s.value_col).alias(chan[c]))
            for c, s in table.columns.items()
        ]
        if not frames:
            return []
        wide = reduce(
            lambda a, b: a.join(b, [KEY, TS, SEQ], "full_outer"), frames
        )
        start, end = getattr(self, "_clip", (None, None))
        if start is not None:
            wide = wide.filter(F.col(TS) >= F.lit(start))
        if end is not None:
            wide = wide.filter(F.col(TS) <= F.lit(end))
        limit = getattr(table, "limit", None)

        def to_updates(rows) -> list[dict]:
            out = []
            for r in rows:
                data = {
                    c: r[chan[c]] for c in names if r[chan[c]] is not None
                }
                if data:
                    out.append(data)
            return out

        if table.index is not None:
            # indexed table: the snapshot is one MERGED row per index
            # value — for every column, the last non-null tick for
            # that index (fields tick on different cycles: e.g. the
            # reference e2_websocket_output's angle vs the delayed
            # radians/sin). Push the merge into the plan as a
            # hash-aggregate of per-column max_by over non-null
            # ticks — only |index values| rows ever reach the driver,
            # never the history (the r7 verdict's indexed-snapshot
            # collect). Rows whose index field didn't tick can't be
            # placed (same contract as the reference, where the index
            # is a field of the published struct) and are dropped.
            idx = chan[table.index]
            # (TS, SEQ, KEY) ordering: two engine keys publishing the
            # same index value in the same cycle must merge
            # deterministically — the same KEY tiebreak the flat
            # replay's orderBy uses
            aggs = [
                F.max_by(
                    F.col(chan[c]),
                    F.when(
                        F.col(chan[c]).isNotNull(),
                        F.struct(F.col(TS), F.col(SEQ), F.col(KEY)),
                    ),
                ).alias(chan[c])
                for c in names
            ]
            grouped = (
                wide.filter(F.col(idx).isNotNull())
                .groupBy(F.col(idx).alias("__idx"))
                .agg(*aggs,
                     F.max(F.struct(F.col(TS), F.col(SEQ), F.col(KEY)))
                     .alias("__last"))
            )
            if limit is not None:
                # perspective Table(index=, limit=): keep the `limit`
                # most-recently-updated index rows (distributed top-k)
                grouped = grouped.orderBy(F.desc("__last")).limit(
                    int(limit)
                )
            return to_updates(grouped.orderBy("__last").collect())
        if limit is not None:
            # perspective Table(limit=) ring semantics: only the
            # trailing `limit` updates can survive in the snapshot, so
            # push the tail-N into the plan — desc orderBy + limit is
            # TakeOrderedAndProject (distributed top-k, no full-history
            # sort or collect at any history size)
            nonnull = reduce(
                lambda a, b: a | b,
                [F.col(chan[c]).isNotNull() for c in names],
            )
            wide = (
                wide.filter(nonnull)
                .orderBy(F.desc(TS), F.desc(SEQ), F.desc(KEY))
                .limit(int(limit))
            )
        return to_updates(wide.orderBy(TS, SEQ, KEY).collect())

    def flush(self) -> None:
        """Deliver the published tables to the manager — snapshots
        update and live subscribers receive upd frames. Unindexed
        tables replay every tick in engine order (tail-N when a ring
        limit is set); INDEXED tables deliver the plan-side merged
        snapshot — one upd per index value (per-column last non-null
        tick), not the per-cycle history."""
        self._armed = False
        self.start()
        for name, table in self._tables.items():
            for data in self._table_rows(table):
                self.manager.send_updates(name, data)

    def publish_stream(self, x, table: str, checkpoint_dir: str | None = None):
        """Structured Streaming twin: each microbatch's rows are
        delivered to ``table`` in (ts, seq) order via foreachBatch."""
        self.start()
        manager = self.manager
        tbl = self._tables[table]

        def _send(batch_df, batch_id):
            cols = [c for c in batch_df.columns if c in tbl.schema] or [
                c for c in batch_df.columns if c not in (KEY, TS, SEQ)
            ]
            # an indexed table's updates must carry the index field
            if tbl.index and tbl.index in batch_df.columns \
                    and tbl.index not in cols:
                cols.append(tbl.index)
            order = [c for c in (TS, SEQ, KEY) if c in batch_df.columns]
            for r in (batch_df.orderBy(*order).collect() if order
                      else batch_df.collect()):
                data = {c: r[c] for c in cols if r[c] is not None}
                if data:
                    manager.send_updates(table, data)

        writer = x.writeStream.foreachBatch(_send)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        return writer.start()
