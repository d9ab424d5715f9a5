"""``csp.curve`` import-path parity (reference csp/curve.py).

``curve`` is the package-level reference-signature factory
(core/refcompat.py — ``curve(typ, data, push_mode=)`` with list,
timedelta-offset, and numpy ``(times, values)`` forms). ``Curve`` is
the pull-adapter authoring class behind it (reference
csp/curve.py:16-47): an original implementation over this package's
PullInputAdapter surface — subclassable, and usable directly with
from_pull_adapter/py_pull_adapter_def.
"""

from __future__ import annotations

import datetime as _dt

from .core.refcompat import curve  # noqa: F401  (package-level factory)
from .sources.other import PullInputAdapter


class Curve(PullInputAdapter):
    """Replay an explicit list of ``(datetime | timedelta, value)``
    pairs: timedelta offsets resolve against the run's start time,
    tz-aware datetimes normalize to naive UTC, pre-start rows are
    skipped, and replay stops at the run's end time."""

    def __init__(self, typ, data):
        super().__init__()
        self._typ = typ
        self._data = list(data)
        self._i = 0

    def start(self, start_time, end_time):
        super().start(start_time, end_time)
        if self._data and isinstance(self._data[0][0], _dt.timedelta):
            self._data = [(start_time + td, v) for td, v in self._data]
        elif self._data and self._data[0][0].tzinfo is not None:
            self._data = [
                (t.astimezone(_dt.timezone.utc).replace(tzinfo=None), v)
                for t, v in self._data
            ]
        while self._i < len(self._data) and self._data[self._i][0] < start_time:
            self._i += 1

    def next(self):
        if self._i < len(self._data):
            t, v = self._data[self._i]
            if t <= self._end_time:
                self._i += 1
                return t, v
        return None
