"""CspPerspectiveTable parity (reference csp/impl/pandas_perspective.py
:114-408): run a pandas frame of edges (TsDtype columns) into a live
perspective-style table.

The reference streams each frame cell's ticks through an
``_apply_updates`` node into a ``perspective.Table`` served by
tornado. Here the DATA PATH is Spark + this repo's websocket table
stack (adapters/websocket_table.py — the same /tables + /snap + WS
upd-frame wire the PerspectiveAdapter uses): every cell edge of the
frame is evaluated in ONE Spark pass per value dtype, rows are
assembled in engine order (one update per (time, frame row), columns
that ticked together merged — exactly the reference node's per-cycle
``new_rows`` batching), and delivered to the table manager, whose
live subscribers receive them as upd frames. Only the Jupyter/browser
widget itself stays out of scope (SURVEY §2.2): ``get_widget`` raises
with instructions, everything else — ``run_historical``, ``run``,
``start``/``stop``/``is_running``/``join``, ``clear``, ``limit`` and
``keep_history``/``index`` semantics, the view exports — is live."""

from __future__ import annotations

import datetime as _dt
import threading
from typing import Any, Optional

import pandas as pd
from pyspark.sql import functions as F

from ..adapters.perspective import PerspectiveAdapter
from ..core.ticks import SEQ, TS, TickStream
from ..utils.datetime import utc_now

_TABLE = "data"


def _frame_to_basket(df: pd.DataFrame) -> dict:
    """Reference pandas_perspective.py:106-112: {(idx, col): edge} for
    every non-null cell of every ts[] column."""
    ts_frame = df.csp.ts_frame()
    basket = {}
    for col, series in ts_frame.items():
        for idx, edge in series.dropna().items():
            basket[(idx, col)] = edge
    return basket


class StaticTable:
    """The object ``run_historical`` returns — the reference hands back
    a ``perspective.Table``; this carries the same view-export surface
    (to_df/to_json/to_columns/to_csv, schema, size) over a plain
    frame. An ``index`` table keeps the LAST update per index value,
    like perspective's indexed Table."""

    def __init__(self, df: pd.DataFrame, index: str | None = None,
                 time_col: str | None = None):
        if index is not None:
            sort_cols = [c for c in (time_col,) if c and c in df.columns]
            if sort_cols:
                df = df.sort_values(sort_cols, kind="stable")
            df = df.groupby(index, sort=False).last().reset_index()
        self._df = df.reset_index(drop=True)

    def view(self) -> "StaticTable":
        return self

    def to_df(self) -> pd.DataFrame:
        return self._df.copy()

    def to_json(self) -> list[dict]:
        return self._df.to_dict(orient="records")

    def to_columns(self) -> dict[str, list]:
        return self._df.to_dict(orient="list")

    def to_csv(self, **kwargs) -> str:
        return self._df.to_csv(index=False, **kwargs)

    def schema(self) -> dict[str, str]:
        return {c: str(t) for c, t in self._df.dtypes.items()}

    def size(self) -> int:
        return len(self._df)


class CspPerspectiveTable:
    """Reference pandas_perspective.py:114-261 calling surface."""

    def __init__(
        self,
        data: pd.DataFrame,
        index_col: str = "index",
        time_col: Optional[str] = "timestamp",
        throttle: Optional[_dt.timedelta] = _dt.timedelta(seconds=0.5),
        keep_history: bool = True,
        limit: int | None = None,
        localize: bool = False,
    ):
        # reference validation, verbatim semantics (:140-147)
        if data.index.nlevels > 1:
            raise ValueError(
                "Perspective does not support multi-indices for rows"
            )
        if data.columns.nlevels > 1:
            raise ValueError(
                "Perspective does not support multi-indices for columns"
            )
        if not time_col and keep_history:
            raise ValueError(
                "time_col must be supplied if keep_history is True"
            )
        if limit and not keep_history:
            raise ValueError("Limit only works when keep_history is True")
        self._data = data
        self._index_col = index_col
        self._time_col = time_col
        self._throttle = throttle
        self._keep_history = keep_history
        self._limit = limit
        self._localize = localize

        self._basket = _frame_to_basket(data)
        self._static_frame = data.csp.static_frame()

        self._adapter = PerspectiveAdapter(0)
        self._table = self._adapter.create_table(
            _TABLE,
            limit=limit,
            index=None if keep_history else index_col,
        )
        # wire-visible schema (the /tables listing): index + time +
        # every frame column, ts columns typed by their subtype
        schema: dict[str, str] = {index_col: "string"}
        if time_col:
            schema[time_col] = "timestamp"
        from ..pandas_ext import TsDtype

        for col in data.columns:
            dt = data.dtypes[col]
            if isinstance(dt, TsDtype):
                schema[col] = getattr(
                    dt.subtype, "__name__", str(dt.subtype)
                )
            else:
                schema[col] = str(dt)
        self._table.schema.update(schema)

        if keep_history:
            self._static_records = self._static_frame.to_dict(
                orient="index"
            )
        else:
            self._static_records = None
            self._preload_static()

        self._runner: threading.Thread | None = None
        self._stop_event = threading.Event()

    # ------------------------------------------------------------- data
    def _preload_static(self) -> None:
        """keep_history=False: the indexed table starts from the static
        frame (reference :196-197 table.update(static_frame))."""
        mgr = self._adapter.manager
        for idx, row in self._static_frame.to_dict(orient="index").items():
            mgr.send_updates(_TABLE, {self._index_col: idx, **row})

    def _engine_rows(self, starttime, endtime) -> list[dict]:
        """Evaluate every cell edge and assemble engine-ordered update
        rows: one Spark action per distinct value dtype (a union can't
        mix value types), merged driver-side on (ts, frame row) — the
        reference node's per-cycle new_rows batching (:60-91)."""
        by_dtype: dict[str, list[tuple[Any, TickStream]]] = {}
        for label, e in self._basket.items():
            ddl = e.df.schema[e.value_col].dataType.simpleString()
            by_dtype.setdefault(ddl, []).append((label, e))
        ticks: list[tuple] = []  # (ts, seq, idx, col, value)
        for group in by_dtype.values():
            parts = []
            for pos, (_, e) in enumerate(group):
                d = e.df.select(
                    F.lit(pos).alias("__cell"), F.col(TS), F.col(SEQ),
                    F.col(e.value_col).alias("__v"),
                )
                if starttime is not None:
                    d = d.filter(F.col(TS) >= F.lit(starttime))
                if endtime is not None:
                    d = d.filter(F.col(TS) <= F.lit(endtime))
                parts.append(d)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            for r in u.orderBy(TS, SEQ, "__cell").collect():
                idx, col = group[r["__cell"]][0]
                ticks.append((r[TS], r[SEQ], idx, col, r["__v"]))
        ticks.sort(key=lambda t: (t[0], t[1]))
        rows: list[dict] = []
        open_rows: dict[Any, dict] = {}
        cur_ts = None
        for ts, _seq, idx, col, v in ticks:
            if ts != cur_ts:
                open_rows = {}
                cur_ts = ts
            row = open_rows.get(idx)
            if row is None:
                row = {}
                open_rows[idx] = row
                if self._index_col:
                    row[self._index_col] = idx
                if self._time_col:
                    row[self._time_col] = (
                        ts.replace(tzinfo=_dt.timezone.utc)
                        if self._localize else ts
                    )
                if self._static_records is not None:
                    row.update(self._static_records.get(idx, {}))
                rows.append(row)
            row[col] = v
        return rows

    # ---------------------------------------------------------- surface
    def clear(self) -> None:
        """Reset the table to its original state (:203-207)."""
        self._adapter.manager.clear(_TABLE)
        if not self._keep_history:
            self._preload_static()

    def graph(self):
        """The wiring that populates the table — kept for reference
        parity; ``run``/``start`` call it (:209-219)."""
        return self._basket

    def run_historical(self, starttime, endtime) -> StaticTable:
        """One-shot: evaluate the frame over [start, end] and build the
        table in one go (:221-239) — the fast path, one engine pass via
        the frame accessor."""
        df = self._data.csp.run(starttime, endtime)
        df.index.set_names(
            [self._index_col, self._time_col], inplace=True
        )
        if not self._time_col:
            df = df.droplevel(-1)
        df = df.reset_index()
        index = None if self._keep_history else self._index_col
        if self._limit:
            df = (
                df.sort_values(self._time_col)
                .tail(self._limit)
                .reset_index(drop=True)
            )
        return StaticTable(df, index=index, time_col=self._time_col)

    def run(self, starttime=None, endtime=_dt.timedelta(seconds=60),
            realtime: bool = True, clear: bool = False) -> None:
        """Feed the live table on the current thread (:241-249).
        ``realtime`` is accepted for parity — delivery is engine-
        ordered replay, the same treatment csp.run gives bounded
        realtime graphs."""
        starttime = starttime or utc_now()
        if isinstance(endtime, _dt.timedelta):
            endtime = starttime + endtime
        if clear:
            self.clear()
        self._adapter.start()
        mgr = self._adapter.manager
        for row in self._engine_rows(starttime, endtime):
            if self._stop_event.is_set():
                break
            mgr.send_updates(_TABLE, row)

    def start(self, starttime=None, endtime=_dt.timedelta(seconds=60),
              *, realtime: bool = True, clear: bool = True,
              auto_shutdown: bool = True) -> None:
        """Feed the table from an engine thread (:251-261)."""
        if clear:
            self.clear()
        self._stop_event.clear()
        self._runner = threading.Thread(
            target=self.run,
            kwargs={"starttime": starttime, "endtime": endtime,
                    "realtime": realtime, "clear": False},
            daemon=True,
        )
        self._runner.start()

    def is_running(self) -> bool:
        return self._runner is not None and self._runner.is_alive()

    def stop(self) -> None:
        if self._runner is None:
            raise ValueError("No active runner to stop")
        self._stop_event.set()
        self.join()

    def join(self) -> None:
        if self._runner is None:
            raise ValueError("No active runner to join")
        self._runner.join()

    @property
    def table(self):
        """The underlying live table adapter (reference returns the
        perspective.Table)."""
        return self._table

    @property
    def adapter(self) -> PerspectiveAdapter:
        """The serving adapter — ``adapter.port`` after start for the
        /tables + WS endpoints."""
        return self._adapter

    def get_widget(self, **override_kwargs):
        """The Jupyter PerspectiveWidget is browser UI — out of scope
        (SURVEY §2.2); subscribe any perspective client to
        ``ws://host:port/subscribe/data`` instead."""
        raise NotImplementedError(
            "PerspectiveWidget rendering is not available — connect a "
            "perspective (or any websocket) client to the adapter's "
            "/subscribe endpoint"
        )

    # view exports over the CURRENT live snapshot (:303-320)
    def _snapshot_df(self) -> pd.DataFrame:
        return pd.DataFrame(self._adapter.manager.get_snapshot(_TABLE))

    def to_df(self, **options) -> pd.DataFrame:
        return self._snapshot_df()

    def to_json(self, **options) -> list[dict]:
        return self._snapshot_df().to_dict(orient="records")

    def to_columns(self, **options) -> dict[str, list]:
        return self._snapshot_df().to_dict(orient="list")

    def to_csv(self, **options) -> str:
        return self._snapshot_df().to_csv(index=False)


class CspPerspectiveMultiTable:
    """reference pandas_perspective.py:333-400: hold several
    CspPerspectiveTable instances and coordinate their lifecycle; the
    widget form composes the member widgets (ipywidgets, gated at
    call time like the reference)."""

    def __init__(self, tables: dict):
        self._tables = dict(tables)

    @property
    def tables(self) -> dict:
        return self._tables.copy()

    def __getitem__(self, name: str):
        return self._tables[name]

    def start(self, starttime=None, endtime=_dt.timedelta(seconds=60), *,
              realtime: bool = True, clear: bool = True,
              auto_shutdown: bool = True):
        """Start every table on its engine thread (the reference runs
        one shared engine thread via run_on_thread; per-table threads
        give the same live-feed semantics). ``auto_shutdown`` is
        accepted for parity — the feed threads are daemons, so they
        never outlive the process."""
        for table in self._tables.values():
            table.start(starttime, endtime, realtime=realtime,
                        clear=clear)

    def is_running(self) -> bool:
        return any(t.is_running() for t in self._tables.values())

    def stop(self) -> None:
        if not any(t._runner is not None for t in self._tables.values()):
            raise ValueError("No active runner to stop")
        for t in self._tables.values():
            if t._runner is not None:
                t.stop()

    def join(self) -> None:
        if not any(t._runner is not None for t in self._tables.values()):
            raise ValueError("No active runner to join")
        for t in self._tables.values():
            if t._runner is not None:
                t.join()

    def get_widget(self, widget: str = "Tab", config: dict | None = None):
        import ipywidgets  # gated: notebook-only dependency

        config = config or {}
        children, titles = [], []
        for title, table in self._tables.items():
            if not config or title in config:
                children.append(table.get_widget(**config.get(title, {})))
                titles.append(title)
        cls = getattr(ipywidgets, widget)
        w = cls(children=children)
        for i, t in enumerate(titles):
            try:
                w.set_title(i, t)
            except AttributeError:
                pass
        return w
