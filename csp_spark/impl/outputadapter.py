"""csp.impl.outputadapter parity (csp/impl/outputadapter.py:8-17)."""

from ..sinks.publish import OutputAdapter  # noqa: F401

__all__ = ["OutputAdapter"]
