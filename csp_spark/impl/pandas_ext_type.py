"""csp.impl.pandas_ext_type parity (reference csp/impl/pandas_ext_type.py):
the TsDtype pandas extension dtype under its reference import path."""

from ..pandas_ext import TsArray, TsDtype  # noqa: F401
