"""csp.impl.wiring.outputs parity (csp/impl/wiring/outputs.py)."""

from ...core.surface import OutputBasket, Outputs  # noqa: F401
