"""csp.impl.wiring.runtime parity (csp/impl/wiring/runtime.py)."""

from ...core.surface import build_graph  # noqa: F401
from ...plans.runtime import run  # noqa: F401


import datetime as _dt

#: reference wiring/runtime.py:16 — the engine's "run forever" endtime
MAX_END_TIME = _dt.datetime(2261, 12, 31, 23, 59, 50, 999999)
