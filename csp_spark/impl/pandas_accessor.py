"""csp.impl.pandas_accessor parity (reference csp/impl/pandas_accessor.py):
importing this module registers the ``.csp`` accessors on pd.Series /
pd.DataFrame — the registration lives in csp_spark.pandas_ext."""

from ..pandas_ext import (  # noqa: F401
    CspDataFrameAccessor,
    CspSeriesAccessor,
    ToCspFrameAccessor,
    ToCspSeriesAccessor,
)


# reference-parity module-scope TypeVars: ported programs do
# `from csp.impl.pandas_accessor import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
