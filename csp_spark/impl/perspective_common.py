"""csp.impl.perspective_common parity (reference
csp/impl/perspective_common.py:26-60): type/time plumbing shared by
the perspective surfaces. The browser widget itself stays out of
scope (SURVEY §2.2) — these are the pure-python helpers
CspPerspectiveTable and the adapters share."""

from __future__ import annotations

from datetime import date, datetime, timezone


def is_perspective3() -> bool:
    """The wire tables this engine serves follow the perspective>=3
    row-delta protocol (adapters/websocket_table.py)."""
    return True


def perspective_type_map() -> dict:
    return {
        str: "string",
        float: "float",
        int: "integer",
        date: "date",
        datetime: "datetime",
        bool: "boolean",
    }


def datetime_to_perspective(dt: datetime) -> int:
    """Naive-UTC or aware datetime → epoch milliseconds."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def date_to_perspective(d: date) -> int:
    return datetime_to_perspective(
        datetime(year=d.year, month=d.month, day=d.day, tzinfo=timezone.utc)
    )
