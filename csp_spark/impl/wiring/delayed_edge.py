"""csp.impl.wiring.delayed_edge parity (csp/impl/wiring/
delayed_edge.py:19-44)."""

from ...core.surface import DelayedEdge  # noqa: F401


# reference-parity module-scope TypeVars: ported programs do
# `from csp.impl.wiring.delayed_edge import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
