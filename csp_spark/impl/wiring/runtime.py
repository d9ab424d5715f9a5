"""csp.impl.wiring.runtime parity (csp/impl/wiring/runtime.py)."""

from ...core.surface import build_graph  # noqa: F401
from ...plans.runtime import run  # noqa: F401
