"""csp.utils namespace parity (reference csp/utils/)."""
from . import datetime

__all__ = ["datetime"]
