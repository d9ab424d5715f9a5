"""csp.impl.wiring.feedback parity (csp/impl/wiring/feedback.py)."""

from ...core.surface import feedback  # noqa: F401
