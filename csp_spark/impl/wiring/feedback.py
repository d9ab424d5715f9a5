"""csp.impl.wiring.feedback parity (csp/impl/wiring/feedback.py)."""

from ...core.surface import feedback  # noqa: F401

# Reference wiring records (csp/impl/wiring/feedback.py:20,39,85):
# there ``feedback = FeedbackOutputDef`` and ``FeedbackInputDef`` is the
# engine-internal record behind ``.out()``. Here csp.feedback carries
# both roles (core/surface.py:222 — batch fixed-point loop replaces the
# one-cycle-delayed C++ adapters), so the Def names are parity aliases.
FeedbackOutputDef = feedback


class FeedbackInputDef:
    """Typed record for a feedback's fed-back input side (reference
    feedback.py:20-33). Engine-internal in the reference; kept here so
    ported wiring-introspection code can import and type-check it."""

    def __init__(self, typ):
        self._type = typ

    def ts_inputs(self):
        return ()


# reference-parity module-scope TypeVars: ported programs do
# `from csp.impl.wiring.feedback import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
