"""csp.impl.pandas_accessor parity (reference csp/impl/pandas_accessor.py):
importing this module registers the ``.csp`` accessors on pd.Series /
pd.DataFrame — the registration lives in csp_spark.pandas_ext."""

from ..pandas_ext import (  # noqa: F401
    CspDataFrameAccessor,
    CspSeriesAccessor,
    ToCspFrameAccessor,
    ToCspSeriesAccessor,
)
