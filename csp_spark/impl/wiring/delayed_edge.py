"""csp.impl.wiring.delayed_edge parity (csp/impl/wiring/
delayed_edge.py:19-44)."""

from ...core.surface import DelayedEdge  # noqa: F401
