"""csp.impl.adaptermanager parity (reference csp/impl/adaptermanager.py
+ wiring/adapters.py py_managed_adapter_def): ONE manager owns a shared
input resource and feeds many subscribed time series.

The reference engine builds the manager impl at engine-build time and
drives ``process_next_sim_timeslice(now)`` from starttime until it
returns None (or the run ends), with each adapter's ``push_tick``
landing on the current timeslice. The batch analog here runs that
exact loop ON THE DRIVER the first time any subscribed stream is
materialized: one pass over the simulated source fills every
subscription's buffer, then each becomes a TickStream shaped by its
PushMode (LAST_VALUE conflates per timestamp, NON_COLLAPSING unrolls
into successive engine cycles, BURST ticks the per-timestamp list).
Reference manager/adapter impl classes run unmodified
(tests/test_reference_verbatim.py e3_adaptermanager_pullinput).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

__all__ = [
    "AdapterManagerImpl", "PendingRowManagerImpl",
    "ManagedSimInputAdapter", "py_managed_adapter_def",
]

_FALSEY = {"false", "f", "no", "n", "0", ""}
_TRUTHY = {"true", "t", "yes", "y", "1"}


def _coerce(value, typ):
    """Field coercion for process_dict. One deliberate deviation from
    the reference's bare ``typ(value)``: bool from TEXT rows parses
    'False'/'0' as False (bool('False') is True in Python — the Spark
    scan path casts the same column to boolean correctly, and the two
    paths must agree)."""
    if isinstance(value, typ):
        return value
    if typ is bool and isinstance(value, str):
        s = value.strip().lower()
        if s in _TRUTHY:
            return True
        if s in _FALSEY:
            return False
        raise ValueError(f"cannot parse {value!r} as bool")
    return typ(value)


class _SimEngine:
    """What the manager impl sees as 'the engine': run bounds + the
    current timeslice (set by the driver loop) + a global tick order."""

    def __init__(self, starttime, endtime):
        self.starttime = starttime
        self.endtime = endtime
        self.now = starttime
        self.order = 0


class AdapterManagerImpl:
    """Runtime manager base (reference adaptermanager.py:7-25)."""

    def __init__(self, engine):
        self._engine = engine

    def start(self, starttime, endtime):
        pass

    def stop(self):
        pass

    def process_next_sim_timeslice(self, now):
        """Push all of timeslice ``now``'s ticks; return the next
        event's datetime, or None when the source is exhausted."""
        raise NotImplementedError


class PendingRowManagerImpl(AdapterManagerImpl):
    """Shared managed-sim manager half for row-source adapters (CSV,
    DB): subclasses supply ``_row_iter(starttime, endtime)`` yielding
    time-ordered ``(time, row_dict)`` pairs; this base owns the
    pending-row timeslice loop, tz normalization to the naive-UTC
    engine clock, symbol routing, and subscribe_all ("") dispatch —
    one implementation so the two adapters can never drift."""

    #: subclasses set this to the symbol column name (or None)
    _symbol_column_attr = "_symbol_column"

    def __init__(self, engine, adapterRep):
        super().__init__(engine)
        self._rep = adapterRep
        self._inputs: dict = {}
        self._rows = None
        self._pending = None

    # ------------------------------------------------------- contract
    def _row_iter(self, starttime, endtime):
        raise NotImplementedError

    #: keep_none passed to process_dict (DB rows may carry SQL NULLs;
    #: csv text rows never do)
    _keep_none = True

    # ------------------------------------------------------- lifecycle
    def start(self, starttime, endtime):
        self._rows = self._normalized(self._row_iter(starttime, endtime))
        # fast-forward to the engine window (replay begins at the
        # first row >= starttime)
        for t, row in self._rows:
            if t >= starttime:
                self._pending = (t, row)
                break

    @staticmethod
    def _normalized(it):
        for t, row in it:
            if t.tzinfo is not None:
                # engine clock is naive UTC
                t = t.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            yield t, row

    def stop(self):
        self._rows = None
        self._pending = None

    def register_input_adapter(self, symbol, adapter):
        self._inputs.setdefault(symbol, []).append(adapter)

    def process_next_sim_timeslice(self, now):
        while self._pending is not None:
            t, row = self._pending
            if t > now:
                return t
            self.process_row(row)
            self._pending = next(self._rows, None)
        return None

    def process_row(self, row):
        sym_col = getattr(self._rep, self._symbol_column_attr, None)
        targets = []
        if sym_col is not None and sym_col in row:
            targets.extend(self._inputs.get(row[sym_col], []))
        for adapter in self._inputs.get("", []):  # subscribe_all
            # a row whose symbol cell IS the empty string must not be
            # delivered twice to the same adapter
            if adapter not in targets:
                targets.append(adapter)
        for adapter in targets:
            adapter.process_dict(row, keep_none=self._keep_none)


class ManagedSimInputAdapter:
    """Runtime per-series adapter base (adaptermanager.py:28-44):
    ``push_tick(value)`` ticks this series at the engine's current
    timeslice."""

    def __init__(self, typ: Any = None, field_map: Any = None):
        from ..core.record import Struct

        # the reference's construction rules (adaptermanager.py:29-37)
        if field_map is None or isinstance(field_map, dict):
            if isinstance(typ, type) and not (
                typ is None or issubclass(typ, Struct)
            ):
                raise TypeError(
                    "type must be csp.Struct when no fieldMap or dict "
                    "fieldMap is used"
                )
        elif not isinstance(field_map, str):
            raise TypeError(
                "fieldMap should be str for single field mapping or "
                "dict for csp.Struct mapping"
            )
        self._typ = typ
        self._type = typ  # reference attribute name
        if field_map is None and isinstance(typ, type) and issubclass(
            typ, Struct
        ):
            field_map = {k: k for k in typ.__metadata__}
        self._field_map = field_map
        self._engine: _SimEngine | None = None
        self._buffer: list = []  # (ts, order, value)

    def start(self, starttime, endtime):
        pass

    def stop(self):
        pass

    def process_dict(self, data: dict, keep_none: bool = True):
        """Reference adaptermanager.py:45-64 contract: convert one row
        mapping into this adapter's type via the field map and tick it.
        str field map -> a scalar edge from one column (None skips the
        row); dict field map -> a struct built from the mapped columns,
        each coerced to its declared field type."""
        fm = self._field_map
        if isinstance(fm, str):
            v = data[fm]
            if v is None:
                return
            value = _coerce(v, self._type)
        else:
            meta = self._type.__metadata__
            final = {}
            for src, dst in (fm or {}).items():
                v = data[src]
                if keep_none or v is not None:
                    final[dst] = _coerce(v, meta[dst])
            value = self._type(**final)
        self.push_tick(value)

    def push_tick(self, value) -> bool:
        eng = self._engine
        if eng is None:
            return False
        eng.order += 1
        self._buffer.append((eng.now, eng.order, value))
        return True


def _value_rows(buffer, push_mode):
    """Shape a subscription's raw (ts, order, value) buffer by its
    PushMode — the reference's duplicate-timestamp semantics."""
    from ..core.surface import PushMode

    by_ts: dict = {}
    for ts, order, v in buffer:
        by_ts.setdefault(ts, []).append((order, v))
    rows = []
    for ts in sorted(by_ts):
        vals = [v for _, v in sorted(by_ts[ts])]
        if push_mode == PushMode.LAST_VALUE:
            rows.append((ts, 0, vals[-1]))
        elif push_mode == PushMode.BURST:
            rows.append((ts, 0, vals))
        else:  # NON_COLLAPSING: one engine cycle per tick
            rows.extend((ts, i, v) for i, v in enumerate(vals))
    return rows


def py_managed_adapter_def(
    name: str, adapterimpl: type, out_type=None, manager_type=None, **decl
):
    """Reference py_managed_adapter_def: returns the graph-time
    subscription constructor — ``Sub(manager, <declared args...>,
    push_mode=...)`` (push_mode implicitly appended, like the
    reference). All subscriptions of one manager share ONE driver run
    of its timeslice loop, triggered lazily on first materialization."""
    from ..core.nodeparse import _elem_type
    from ..core.record import Struct
    from ..core.surface import PushMode, ts as _ts
    from ..core.ticks import GLOBAL_KEY, TickStream

    elem = getattr(out_type, "__csp_elem__", None) if (
        isinstance(out_type, type) and issubclass(out_type, _ts)
    ) else None
    value_ddl = _elem_type(out_type) if out_type is not None else "double"

    def _run_manager(mgr, pending):
        from ..plans.runtime import engine_end_time, engine_start_time

        start = getattr(mgr, "_csp_spark_start", None)
        end = getattr(mgr, "_csp_spark_end", None)
        try:
            start = start or engine_start_time()
            end = end or engine_end_time()
        except Exception:
            pass
        if start is None:
            raise ValueError(
                f"{name}: the adapter manager needs engine bounds — "
                "wire inside csp.run(starttime=..., endtime=...)"
            )
        engine = _SimEngine(start, end)
        impl = mgr._create(engine, {})
        for entry in pending:
            adapter = adapterimpl(impl, *entry["args"], **entry["kwargs"])
            adapter._engine = engine
            entry["adapter"] = adapter
        impl.start(start, end)
        now = start
        while now is not None and (end is None or now <= end):
            engine.now = now
            now = impl.process_next_sim_timeslice(now)
        impl.stop()

    class _ManagedStream(TickStream):
        __slots__ = ("_mgr", "_entry", "_df_cache")

        def __init__(self, mgr, entry):
            self._mgr = mgr
            self._entry = entry
            self._df_cache = None
            self.value_col = "value"

        @property
        def df(self):
            if self._df_cache is None:
                pending = self._mgr.__dict__.get("_csp_spark_pending", [])
                if any("adapter" not in e for e in pending):
                    _run_manager(self._mgr, pending)
                push_mode = self._entry["push_mode"]
                rows = _value_rows(
                    self._entry["adapter"]._buffer, push_mode
                )
                vddl = value_ddl
                conv = (
                    (lambda v: v.to_dict())
                    if isinstance(elem, type) and issubclass(elem, Struct)
                    else (lambda v: v)
                )
                if push_mode == PushMode.BURST:
                    vddl = f"array<{value_ddl}>"
                    data = [
                        (GLOBAL_KEY, ts, seq, [conv(x) for x in v])
                        for ts, seq, v in rows
                    ]
                else:
                    data = [
                        (GLOBAL_KEY, ts, seq, conv(v)) for ts, seq, v in rows
                    ]
                from ..core.session import get_spark

                self._df_cache = get_spark().createDataFrame(
                    data,
                    f"key string, ts timestamp, seq long, value {vddl}",
                )
            return self._df_cache

    def factory(mgr, *args, push_mode=None, **kwargs):
        if push_mode is None:
            push_mode = PushMode.NON_COLLAPSING
        try:
            from ..plans.runtime import engine_end_time, engine_start_time

            mgr._csp_spark_start = engine_start_time()
            mgr._csp_spark_end = engine_end_time()
        except Exception:
            pass
        pending = mgr.__dict__.setdefault("_csp_spark_pending", [])
        entry = {"args": args, "kwargs": kwargs, "push_mode": push_mode}
        pending.append(entry)
        return _ManagedStream(mgr, entry)

    factory.__name__ = name
    return factory
