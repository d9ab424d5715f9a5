"""csp.impl.pulladapter parity (csp/impl/pulladapter.py:10-44)."""

from ..sources.other import PullInputAdapter  # noqa: F401

__all__ = ["PullInputAdapter"]
