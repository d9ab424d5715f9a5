"""csp.impl.error_handling parity (reference
csp/impl/error_handling.py)."""

from ..core.surface import set_print_full_exception_stack  # noqa: F401


class ExceptionContext:
    """reference error_handling.py:12-40: a with-block that, unless
    PRINT_EXCEPTION_FULL_STACK is set, trims engine-internal frames
    from a propagating traceback so users see THEIR wiring line first.
    This engine's build errors already raise from the user's frame, so
    the default path is a no-op passthrough; the class-level flag is
    shared with set_print_full_exception_stack."""

    PRINT_EXCEPTION_FULL_STACK = False

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        return False  # never swallow
