"""csp.impl.wiring.dynamic parity (csp/impl/wiring/dynamic.py)."""

from ...plans.runtime import dynamic  # noqa: F401
