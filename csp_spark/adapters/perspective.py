"""PerspectiveAdapter — the reference's perspective-widget feed
(csp/adapters/perspective.py:166-253) with the DATA PATH on this
repo's websocket table stack.

The reference pushes ticks into ``perspective-python`` Tables served
by tornado; the browser widget renders them. Neither perspective nor
tornado ships in this environment, and the WIDGET itself is UI (out
of scope — SURVEY §2.2); what this module keeps is the adapter
AUTHORING SURFACE and the live feed: ``PerspectiveAdapter(port)``,
``create_table(name, limit=None, index=None)``, ``table.publish(...)``
— served as /tables + /snap + WS /subscribe row-delta updates
(adapters/websocket_table.py), which a perspective (or any) client
can consume. ``limit`` caps an unindexed table's snapshot to the last
N rows, matching perspective's Table(limit=) ring semantics;
``throttle``/``threadpool_size`` are accepted for signature parity
(delivery here is engine-ordered batch flush, not a live ioloop)."""

from __future__ import annotations

import datetime as _dt

from .websocket_table import TableAdapter, WebsocketTableAdapter

__all__ = ["PerspectiveAdapter", "PerspectiveTableAdapter"]


class PerspectiveTableAdapter(TableAdapter):
    """Reference perspective.py:166-199 — a TableAdapter with the
    perspective ``limit`` option."""

    def __init__(self, name: str, limit: int | None, index: str | None):
        super().__init__(name, index)
        self.limit = limit


class PerspectiveAdapter(WebsocketTableAdapter):
    """Reference perspective.py:202-253 calling surface over the
    websocket table server."""

    def __init__(
        self,
        port: int,
        threadpool_size: int = 2,
        throttle: _dt.timedelta = _dt.timedelta(seconds=1),
    ):
        super().__init__(port)
        self._threadpool_size = threadpool_size
        self._throttle = throttle

    def copy(self) -> "PerspectiveAdapter":
        res = PerspectiveAdapter(
            self._port, self._threadpool_size, self._throttle
        )
        res._tables.update(self._tables)
        return res

    def create_table(
        self, name: str, limit: int | None = None, index: str | None = None
    ) -> PerspectiveTableAdapter:
        if name in self._tables:
            raise ValueError(f"Table {name} already exists")
        table = self._tables[name] = PerspectiveTableAdapter(
            name, limit, index
        )
        self._arm()
        return table


def perspective_thread(manager=None):
    """reference perspective.py: run a perspective manager's loop on a
    daemon thread (needs perspective-python at call time)."""
    import threading

    import perspective  # gated: not shipped in this environment

    def _loop():
        psp_loop = perspective.PerspectiveManager() if manager is None else manager
        psp_loop.loop()

    t = threading.Thread(target=_loop, daemon=True)
    t.start()
    return t


def __getattr__(name):
    # View / Table are perspective-python's own classes (the reference
    # re-exports them); resolve lazily so importing this module never
    # requires the optional dependency
    if name in ("View", "Table"):
        try:
            import perspective
        except ImportError as e:
            # AttributeError keeps hasattr() probes safe; a
            # `from ... import View` still surfaces as ImportError
            raise AttributeError(
                f"{name} requires perspective-python: {e}"
            ) from e
        return getattr(perspective, name)
    raise AttributeError(f"module 'csp.adapters.perspective' has no attribute {name!r}")


__all__ += ["perspective_thread"]
# View/Table stay resolvable via __getattr__ either way, but only
# advertise them in __all__ when the optional dep is importable —
# otherwise `from csp.adapters.perspective import *` (which resolves
# every __all__ name eagerly) breaks on a machine without
# perspective-python
try:  # pragma: no cover - environment-dependent
    import perspective as _psp  # noqa: F401

    __all__ += ["View", "Table"]
except ImportError:
    pass
