"""csp.impl.wiring.graph parity (csp/impl/wiring/graph.py)."""

from ...core.surface import graph  # noqa: F401
