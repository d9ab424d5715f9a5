"""csp.impl.pushpulladapter parity — hybrid replay→live authoring.

Reference: csp/impl/pushpulladapter.py (PushPullInputAdapter) +
csp/impl/wiring/adapters.py:297 (py_pushpull_adapter_def). A pushpull
adapter's thread first pushes HISTORICAL ticks carrying their own
timestamps (``push_tick(False, t, v)``), then flips to live pushes
(``push_tick(True, t, v)``); ``flag_replay_complete()`` tells the
engine no live phase follows.

Batch-capture analog (same phase as impl/pushadapter.py): the thread
runs during the realtime window and every tick is recorded at its
PROVIDED timestamp (clamped to the engine bounds) — replay rows land
at their historical times, live rows at their live times, exactly the
ordering the reference engine replays. The bulk hybrid path (large
backlogs) is streaming/hybrid.py's replay∪live splice; this surface
is the authoring-API form.
"""

from __future__ import annotations

import datetime as _dt

from .pushadapter import py_push_adapter_def

__all__ = ["PushPullInputAdapter", "py_pushpull_adapter_def", "PushGroup"]

# the reference re-exports PushGroup from this module path too
from ..streaming.sources import PushGroup  # noqa: E402,F401


class PushPullInputAdapter:
    """User pushpull authoring base: optional ``start(starttime,
    endtime)`` / ``stop()`` lifecycle; ``push_tick(live, when, value)``
    from your thread; ``flag_replay_complete()`` ends the replay
    phase (a no-op signal in the batch capture — the window bounds
    the run)."""

    def __init__(self):
        self._csp_buffer: list = []
        self._csp_capture = None
        self._csp_replay_done = False

    def push_tick(self, live: bool, when: _dt.datetime, value) -> bool:
        cap = getattr(self, "_csp_capture", None)
        if cap is None or not cap.active:
            return False
        _, order = cap.stamp()
        if when < cap.start:
            when = cap.start
        if when > cap.end:
            when = cap.end
        self.__dict__.setdefault("_csp_buffer", []).append(
            (when, order, value)
        )
        return True

    def flag_replay_complete(self) -> None:
        self._csp_replay_done = True

    def start(self, starttime, endtime):
        pass

    def stop(self):
        pass


def py_pushpull_adapter_def(
    name: str, adapterimpl: type, out_type=None, manager_type=None,
    memoize: bool = True, force_memoize: bool = False, **decl,
):
    """Reference py_pushpull_adapter_def calling convention — the
    factory/capture machinery is py_push_adapter_def's; only the
    adapter base's push_tick signature differs (explicit live flag +
    timestamp). ``memoize``/``force_memoize`` accepted for signature
    parity (wiring here is explicit, not memoized)."""
    return py_push_adapter_def(name, adapterimpl, out_type, manager_type,
                               **decl)

from .pushadapter import PushBatch, PushGroup  # noqa: E402,F401
