"""csp.impl.wiring.threaded_runtime parity (csp/impl/wiring/
threaded_runtime.py)."""

from ...plans.runtime import run_on_thread  # noqa: F401

from ...plans.runtime import ThreadRunner  # noqa: E402,F401
