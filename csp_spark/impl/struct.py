"""csp.impl.struct parity (reference csp/impl/struct.py): Struct
under its defining-module path — ``from csp.impl.struct import
Struct`` is the second most common csp.impl import in reference
code."""

from ..core.record import Struct  # noqa: F401
