"""csp.impl.warnings parity (reference csp/impl/warnings.py): the
pythonic-syntax deprecation-warning toggle."""


class PythonicDeprecationWarning:
    def __init__(self, warn: bool):
        self.warn = warn

    def __bool__(self) -> bool:
        return self.warn


WARN_PYTHONIC = PythonicDeprecationWarning(False)


def set_deprecation_warning(new_value: bool) -> bool:
    """Toggle deprecation warnings for outdated csp syntax; returns
    the previous setting."""
    old = WARN_PYTHONIC.warn
    WARN_PYTHONIC.warn = new_value
    return old
