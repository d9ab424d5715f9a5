"""csp.adapters.status parity (reference csp/adapters/status.py):
the Status struct + Level enum every adapter manager's ``.status()``
stream carries.

Spark mapping: Structured Streaming surfaces adapter health through
``StreamingQuery.status``/``lastProgress`` and exceptions instead of an
in-graph stream; ``query_status`` converts that surface into the same
typed Status record so monitoring code written against the reference
shape ports unchanged. For an in-graph status stream, push Status
rows through streaming.sources.GenericPushAdapter exactly like any
other tick source.
"""
from __future__ import annotations

from enum import IntEnum

from ..core.record import Struct


class Level(IntEnum):
    DEBUG = 0
    INFO = 1
    WARNING = 2
    ERROR = 3
    CRITICAL = 4


class Status(Struct):
    level: int
    status_code: int
    msg: str


def query_status(query) -> Status:
    """Typed Status snapshot of a StreamingQuery: ERROR + the exception
    text if the query died, INFO + the current status message while
    healthy (the reference's adapter managers push the same shape on
    connect/disconnect/error events)."""
    exc = query.exception()
    if exc is not None:
        return Status(level=int(Level.ERROR), status_code=1, msg=str(exc))
    st = query.status or {}
    return Status(
        level=int(Level.INFO),
        status_code=0,
        msg=str(st.get("message", "")),
    )


__all__ = ["Level", "Status", "query_status"]
