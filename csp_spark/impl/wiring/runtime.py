"""csp.impl.wiring.runtime parity (csp/impl/wiring/runtime.py)."""

from ...core.surface import build_graph  # noqa: F401
from ...plans.runtime import run  # noqa: F401


import datetime as _dt

#: reference wiring/runtime.py:16 — the engine's "run forever" endtime
MAX_END_TIME = _dt.datetime(2261, 12, 31, 23, 59, 50, 999999)


class GraphRunInfo:
    """reference wiring/runtime.py:116-150 contract: thread-visible
    (starttime, endtime, realtime) of the active run. Here the engine
    frame already lives on ``plans.runtime._run_info_stack``, so
    :meth:`get_cur_run_times_info` answers from an explicitly entered
    GraphRunInfo first and falls back to the active run frame."""

    import threading as _threading

    TLS = _threading.local()

    def __init__(self, starttime, endtime, realtime):
        self._starttime = starttime
        self._endtime = endtime
        self._realtime = realtime
        self._prev = None

    @property
    def starttime(self):
        return self._starttime

    @property
    def endtime(self):
        return self._endtime

    @property
    def is_realtime(self):
        return self._realtime

    @classmethod
    def get_cur_run_times_info(cls, raise_if_missing=True):
        info = getattr(cls.TLS, "instance", None)
        if info is None:
            from ...plans.runtime import _run_info_stack

            if _run_info_stack:
                frame = _run_info_stack[-1]
                info = cls(
                    frame.get("start"), frame.get("end"),
                    bool(frame.get("realtime")),
                )
        if info is None and raise_if_missing:
            raise RuntimeError(
                "csp graph information is not available outside of csp.run"
            )
        return info

    def __enter__(self):
        self._prev = getattr(self.TLS, "instance", None)
        self.TLS.instance = self
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.TLS.instance = self._prev
        return False
