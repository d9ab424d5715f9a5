"""csp.impl.wiring.numba_node parity (csp/impl/wiring/
numba_node.py)."""

from ...core.surface import numba_node  # noqa: F401
