"""csp.utils.datetime parity (reference csp/utils/datetime.py)."""
from datetime import datetime, timezone


def utc_now() -> datetime:
    """Current UTC wall-clock, tz-naive — the engine convention (the
    session runs UTC and all tick timestamps are naive UTC)."""
    return datetime.now(timezone.utc).replace(tzinfo=None)


__all__ = ["utc_now"]
