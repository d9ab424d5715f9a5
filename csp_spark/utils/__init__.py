"""csp.utils namespace parity (reference csp/utils/*): dev tooling.
Currently: csp_watch_profile (live profile watcher over the Spark UI
REST API)."""

from . import csp_watch_profile  # noqa: F401
