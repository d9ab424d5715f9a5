"""csp.impl.wiring.feedback parity (csp/impl/wiring/feedback.py)."""

from ...core.surface import feedback  # noqa: F401


# reference-parity module-scope TypeVars: ported programs do
# `from csp.impl.wiring.feedback import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
