"""csp.impl.pushadapter parity — realtime PUSH adapter authoring.

Reference surface: csp/impl/pushadapter.py (PushInputAdapter),
csp/impl/wiring/adapters.py py_push_adapter_def, and
csp/impl/genericpushadapter.py (GenericPushAdapter). In the reference,
push adapters run their own threads and hand ticks to the realtime
engine through a lock-free queue; the engine stamps each tick with its
wall-clock arrival time.

The batch-evaluator analog is a CAPTURE phase: ``csp.run(...,
realtime=True)`` builds the graph (wiring registers every push
adapter on the run frame), then — before collecting outputs — starts
every adapter/manager thread, lets them push for the run's wall-clock
duration, stops them, and replays the captured (arrival-time, value)
buffers as batch TickStreams shaped by each subscription's PushMode.
User adapter classes from the reference's own examples run unmodified
(tests/test_reference_verbatim.py e1/e4/e5/e7 of 04_writing_adapters).

Scale note: this is an authoring/ingest-edge surface (one driver-side
thread per adapter, exactly like the reference's per-adapter threads).
Bulk live ingestion is the streaming module's job (file/kafka/socket
sources feeding Structured Streaming); captured buffers here are
bounded by the realtime window.
"""

from __future__ import annotations

import datetime as _dt
import os
import threading
import time
from typing import Any

from ..core.ticks import GLOBAL_KEY, TickStream

__all__ = [
    "PushInputAdapter",
    "GenericPushAdapter",
    "py_push_adapter_def",
    "drive_captures",
]

#: safety cap on the wall-clock capture window (a runaway endtime in a
#: test must not hang the build) — the reference examples run 2s
_MAX_CAPTURE_SECONDS = float(os.environ.get("CSP_SPARK_PUSH_CAPTURE_MAX_S", "60"))


def _utc_now() -> _dt.datetime:
    from ..utils.datetime import utc_now

    return utc_now()


class _CaptureClock:
    """Shared arrival-stamp source for one capture phase: wall-clock
    arrival clamped into the engine window, plus a global order counter
    (the engine-cycle tiebreak for same-microsecond pushes)."""

    def __init__(self, start: _dt.datetime, end: _dt.datetime):
        self.start = start
        self.end = end
        self.active = False
        self._order = 0
        self._lock = threading.Lock()

    def stamp(self) -> tuple[_dt.datetime, int]:
        now = _utc_now()
        if now < self.start:
            now = self.start
        if now > self.end:
            now = self.end
        with self._lock:
            self._order += 1
            return now, self._order


class PushInputAdapter:
    """User push-adapter authoring base (reference
    csp/impl/pushadapter.py): subclass with an optional
    ``start(starttime, endtime)`` / ``stop()`` lifecycle and call
    ``push_tick(value)`` from your thread. Reference impls that skip
    ``super().__init__()`` still work (buffers lazily attach)."""

    def __init__(self):
        self._csp_buffer: list = []
        self._csp_capture: _CaptureClock | None = None

    def push_tick(self, value, batch: "PushBatch | None" = None) -> bool:
        cap = getattr(self, "_csp_capture", None)
        if cap is None or not cap.active:
            return False
        if batch is not None:
            # defer: the batch stamps ONE (ts, order) for every member
            # at __exit__, so they land on the same engine cycle
            batch._append(self, value)
            return True
        ts, order = cap.stamp()
        self.__dict__.setdefault("_csp_buffer", []).append((ts, order, value))
        return True

    def start(self, starttime, endtime):
        pass

    def stop(self):
        pass


def _current_frame() -> dict:
    from ..plans.runtime import _run_info_stack

    if not _run_info_stack:
        raise RuntimeError(
            "push adapters need a live engine — wire inside "
            "csp.run(starttime=..., endtime=..., realtime=True)"
        )
    return _run_info_stack[-1]


def _value_ddl(out_type) -> tuple[str, Any]:
    from ..core.nodeparse import _elem_type
    from ..core.surface import ts as _ts

    elem = None
    if isinstance(out_type, type) and issubclass(out_type, _ts):
        elem = getattr(out_type, "__csp_elem__", None)
    elif isinstance(out_type, type):
        elem = out_type
    return (_elem_type(out_type) if out_type is not None else "double"), elem


class _PushStream(TickStream):
    """Lazy captured-buffer stream: materializes after drive_captures
    ran, shaped by the subscription's PushMode (same shaping as the
    managed-sim path — impl/adaptermanager._value_rows)."""

    __slots__ = ("_entry", "_value_ddl", "_elem", "_df_cache")

    def __init__(self, entry: dict, value_ddl: str, elem):
        self._entry = entry
        self._value_ddl = value_ddl
        self._elem = elem
        self._df_cache = None
        self.value_col = "value"

    @property
    def df(self):
        if self._df_cache is None:
            adapter = self._entry.get("adapter")
            if adapter is None or not self._entry.get("captured"):
                raise RuntimeError(
                    "push adapter stream read before its capture ran — "
                    "wire inside csp.run(realtime=True, starttime=..., "
                    "endtime=...)"
                )
            from ..core.record import Struct
            from ..core.session import get_spark
            from ..core.surface import PushMode
            from .adaptermanager import _value_rows

            rows = _value_rows(
                list(getattr(adapter, "_csp_buffer", [])),
                self._entry["push_mode"],
            )
            vddl = self._value_ddl
            conv = (
                (lambda v: v.to_dict())
                if isinstance(self._elem, type)
                and issubclass(self._elem, Struct)
                else (lambda v: v)
            )
            if self._entry["push_mode"] == PushMode.BURST:
                vddl = f"array<{self._value_ddl}>"
                data = [
                    (GLOBAL_KEY, ts, seq, [conv(x) for x in v])
                    for ts, seq, v in rows
                ]
            else:
                data = [
                    (GLOBAL_KEY, ts, seq, conv(v)) for ts, seq, v in rows
                ]
            self._df_cache = get_spark().createDataFrame(
                data, f"key string, ts timestamp, seq long, value {vddl}"
            )
        return self._df_cache


class GenericPushAdapter:
    """csp.GenericPushAdapter (reference genericpushadapter.py:19-60):
    the simplest push surface — ``GenericPushAdapter(typ)`` inside a
    graph, ``push_tick`` from any thread, ``out()`` is the edge.

    Construction dispatch: a TYPE first argument is this capture-mode
    adapter; anything else (a SparkSession) routes to the Structured
    Streaming PushAdapter (streaming/sources.py), the live-ingest form.
    """

    def __new__(cls, typ=None, name: str | None = None, *args, **kwargs):
        if cls is GenericPushAdapter and not isinstance(typ, type):
            from ..streaming.sources import PushAdapter

            return PushAdapter(typ, name, *args, **kwargs)
        return super().__new__(cls)

    def __init__(self, typ: type, name: str | None = None):
        from ..core.surface import PushMode

        self._name = name or type(self).__name__
        self._started_evt = threading.Event()
        self._stopped_evt = threading.Event()
        self._csp_buffer: list = []
        self._csp_capture: _CaptureClock | None = None
        ddl, elem = _value_ddl(typ)
        self._entry = {
            "adapter": self,
            "push_mode": PushMode.NON_COLLAPSING,
            "captured": False,
        }
        frame = _current_frame()
        frame.setdefault("push_captures", []).append(
            {"mgr": None, "generic": True, "entries": [self._entry]}
        )
        self._out = _PushStream(self._entry, ddl, elem)

    # ------------------------------------------------- reference API
    def push_tick(self, value) -> bool:
        cap = self._csp_capture
        if cap is None or not cap.active:
            return False
        ts, order = cap.stamp()
        self._csp_buffer.append((ts, order, value))
        return True

    def wait_for_start(self, timeout: float | None = None) -> bool:
        return self._started_evt.wait(timeout)

    def started(self) -> bool:
        return self._started_evt.is_set()

    def stopped(self) -> bool:
        return self._stopped_evt.is_set()

    def out(self) -> TickStream:
        return self._out


def py_push_adapter_def(
    name: str, adapterimpl: type, out_type=None, manager_type=None, **decl
):
    """Reference py_push_adapter_def (csp/impl/wiring/adapters.py):
    returns the graph-time factory. Without ``manager_type`` the
    factory is ``A(<declared args...>, push_mode=...)`` and the impl is
    constructed as ``adapterimpl(*args)``; with ``manager_type`` the
    factory is ``A(manager, <args...>, push_mode=...)`` and the impl is
    ``adapterimpl(manager_impl, *args)`` where ``manager_impl =
    manager._create(engine, memo)`` is built ONCE per manager (all its
    subscriptions share one capture). ``push_mode`` defaults to
    NON_COLLAPSING exactly like the reference (adapters.py:46)."""
    ddl, elem = _value_ddl(out_type)

    def factory(*args, push_mode=None, **kwargs):
        from ..core.surface import PushMode

        if push_mode is None:
            push_mode = PushMode.NON_COLLAPSING
        frame = _current_frame()
        groups = frame.setdefault("push_captures", [])
        entry = {
            "adapterimpl": adapterimpl,
            "kwargs": kwargs,
            "push_mode": push_mode,
            "adapter": None,
            "captured": False,
        }
        if manager_type is not None:
            if not args:
                raise TypeError(f"{name}: first argument must be the manager")
            mgr, *rest = args
            entry["args"] = tuple(rest)
            group = next(
                (g for g in groups if g.get("mgr") is mgr and not g.get("done")),
                None,
            )
            if group is None:
                group = {"mgr": mgr, "entries": []}
                groups.append(group)
            group["entries"].append(entry)
        else:
            entry["args"] = tuple(args)
            groups.append({"mgr": None, "entries": [entry]})
        return _PushStream(entry, ddl, elem)

    factory.__name__ = name
    return factory


def drive_captures(frame: dict) -> None:
    """Run the capture phase for every push group registered on this
    run frame: construct impls, start threads, sleep the run's
    wall-clock window ONCE (shared across groups), stop everything,
    and mark buffers ready. Called by plans/runtime.run after graph
    build, before output collection."""
    groups = [g for g in frame.get("push_captures", []) if not g.get("done")]
    if not groups:
        return
    start, end = frame.get("start"), frame.get("end")
    if start is None or end is None:
        raise ValueError(
            "push adapters need bounded engine time — csp.run("
            "starttime=..., endtime=...)"
        )
    # the engine replays the PAST portion of [start, end] instantly
    # (reference realtime runs starting in the past fast-forward
    # history); only the future portion is waited for in wall-clock
    duration = min(
        max((end - _utc_now()).total_seconds(), 0.0),
        max((end - start).total_seconds(), 0.0),
        _MAX_CAPTURE_SECONDS,
    )
    clock = _CaptureClock(start, end)

    from .adaptermanager import _SimEngine

    started_adapters: list = []
    started_impls: list = []
    generic: list = []
    for g in groups:
        if g.get("generic"):
            a = g["entries"][0]["adapter"]
            a._csp_capture = clock
            generic.append(a)
            continue
        if g["mgr"] is not None:
            engine = _SimEngine(start, end)
            impl = g["mgr"]._create(engine, {})
            g["impl"] = impl
            for e in g["entries"]:
                adapter = e["adapterimpl"](impl, *e["args"], **e["kwargs"])
                adapter._csp_capture = clock
                e["adapter"] = adapter
                started_adapters.append(adapter)
            # output adapters register on the shared impl at build time
            # (reference engine-build order); their tick delivery runs
            # after the capture, once the input buffers exist
            for o in g.get("outputs", []):
                o["adapter"] = o["adapterimpl"](
                    impl, *o["args"], **o["kwargs"]
                )
            started_impls.append(impl)
        else:
            for e in g["entries"]:
                adapter = e["adapterimpl"](*e["args"], **e["kwargs"])
                adapter._csp_capture = clock
                e["adapter"] = adapter
                started_adapters.append(adapter)

    clock.active = True
    for a in generic:
        a._started_evt.set()
    for a in started_adapters:
        a.start(start, end)
    for impl in started_impls:
        impl.start(start, end)
    try:
        time.sleep(duration)
    finally:
        clock.active = False
        for impl in started_impls:
            impl.stop()
        for a in started_adapters:
            a.stop()
        for a in generic:
            a._stopped_evt.set()
        for g in groups:
            g["done"] = True
            for e in g["entries"]:
                e["captured"] = True
    # deferred output delivery: engine-ordered on_tick replay of each
    # published stream into its manager-shared output adapter
    from ..sinks.publish import to_output_adapter

    for g in groups:
        for o in g.get("outputs", []):
            to_output_adapter(o["stream"], o["adapter"])


from ..streaming.sources import PushGroup  # noqa: E402,F401  (reference pushadapter.py:3)


class PushBatch:
    """reference csp/impl/pushadapter.py:4 (_cspimpl.PushBatch): group
    pushes — possibly across adapters — into a SINGLE engine cycle::

        with PushBatch(engine) as batch:
            a.push_tick(v1, batch)
            b.push_tick(v2, batch)

    All deferred ticks take one shared (arrival ts, order) stamp at
    block exit, which IS this engine's cycle identity. The ``engine``
    argument is accepted for reference source compatibility (capture
    mode resolves the clock from the adapters themselves)."""

    def __init__(self, engine=None):
        self._entries: list = []

    def _append(self, adapter, value) -> None:
        self._entries.append((adapter, value))

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        entries, self._entries = self._entries, []
        if exc_type is not None:
            return False
        stamp = None
        for adapter, value in entries:
            cap = getattr(adapter, "_csp_capture", None)
            if cap is None or not cap.active:
                continue
            if stamp is None:
                stamp = cap.stamp()
            adapter.__dict__.setdefault("_csp_buffer", []).append(
                (*stamp, value)
            )
        return False
