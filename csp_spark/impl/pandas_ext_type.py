"""csp.impl.pandas_ext_type parity (reference csp/impl/pandas_ext_type.py):
the TsDtype pandas extension dtype under its reference import path."""

from ..pandas_ext import TsArray, TsDtype  # noqa: F401


#: reference pandas_ext_type.py str_type/is_csp_type helpers
def str_type(typ) -> str:
    """Short name of the inner type (the reference uses it to render
    the dtype string, e.g. ``csp[float]``)."""
    return getattr(typ, "__name__", str(typ))


def is_csp_type(arr_or_dtype) -> bool:
    """True when the array/dtype is a TsDtype (reference
    pandas_ext_type.py:652-658)."""
    t = getattr(arr_or_dtype, "dtype", arr_or_dtype)
    try:
        return isinstance(t, TsDtype) or (
            isinstance(t, type) and issubclass(t, TsDtype)
        )
    except Exception:
        return False


# reference-parity module-scope TypeVars: ported programs do
# `from csp.impl.pandas_ext_type import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
