from .rolling import Rolling, RollingPair
from .ema import ema_var, ema_std, ema_cov
from .matrix import cov_corr_matrix, rolling_cov_matrix
from .resample import ohlc_bars, session_bars, sessionize

# functional csp.stats surface (reference csp/stats.py names) — thin
# adapters over Rolling/RollingPair so reference code is source-portable;
# ema and the matrix forms come from HERE (the gated wrappers with
# trigger/reset/min_data_points/interval + np-array-edge support over
# the ema.py / matrix.py kernels)
from .functions import (  # noqa: F401
    argmax, argmin, corr, corr_matrix, count, cov, cov_matrix,
    cross_sectional, ema, first, gmean,
    kurt, last, list_to_numpy, max, mean, median, min, min_max,
    numpy_to_list, prod, quantile, rank, sem, skew, stddev, sum, unique,
    var,
)

__all__ = [
    "Rolling", "RollingPair", "ema", "ema_var", "ema_std", "ema_cov",
    "cov_matrix", "corr_matrix", "cov_corr_matrix", "rolling_cov_matrix",
    "ohlc_bars",
    "sessionize", "session_bars",
    "argmax", "argmin", "corr", "count", "cov", "cross_sectional",
    "first", "gmean", "kurt", "last", "list_to_numpy", "max", "mean",
    "median", "min", "min_max", "numpy_to_list", "prod", "quantile",
    "rank", "sem", "skew", "stddev", "sum", "unique", "var",
]


import typing as _typing

U = _typing.TypeVar("U")

#: reference stats.py:51 — raised message when a NumPy window shape
#: is unknown at trigger time
NP_SHAPE_ERROR = (
    "Shape of the NumPy array was unknown at the time the trigger ticked."
)


# reference-parity module-scope TypeVars: ported programs do
# `from csp.stats import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
