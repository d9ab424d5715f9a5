"""csp.utils namespace parity (reference csp/utils/*): dev tooling
(csp_watch_profile — live profile watcher over the Spark UI REST API)
and the datetime helpers."""

from . import csp_watch_profile, datetime  # noqa: F401

__all__ = ["csp_watch_profile", "datetime"]
