"""csp.impl.error_handling parity (reference
csp/impl/error_handling.py)."""

from ..core.surface import set_print_full_exception_stack  # noqa: F401
