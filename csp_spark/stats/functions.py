"""Functional csp.stats surface: reference users write
``csp.stats.mean(x, interval, min_window=...)`` (csp/stats.py:1686),
not a window-builder object. Each function here is a thin adapter
over the Rolling/RollingPair engine (rolling.py) or the EMA family
(ema.py) with the reference's signature shape, so reference stats
code is source-portable. All return TickStreams (value = statistic).

Stat-specific options mirror csp/stats.py: ``weights`` switches
sum/mean/var/stddev/sem to the weighted kernels (:1629/:1686/:2396),
``ddof``/``bias``/``excess`` match the variance and moment families,
``quant``/``interpolation`` the quantile surface (:1800),
``precision`` the unique() rounding (:1504). ``recalc`` is accepted
and ignored: its purpose in the reference is flushing the O(1)
incremental accumulators' float error (stats.py:218-282), and this
engine recomputes every window exactly, so there is no drift to
flush.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import functions as F

from ..core.ticks import TickStream
from .ema import ema, ema_cov, ema_std, ema_var  # noqa: F401 (re-export)
from .rolling import Rolling, RollingPair

_Interval = "int | _dt.timedelta | None"


def _roll(x, interval, kw, weights=None) -> Rolling:
    return Rolling(
        x,
        interval=interval,
        min_window=kw.pop("min_window", None),
        min_data_points=kw.pop("min_data_points", 0),
        ignore_na=kw.pop("ignore_na", True),
        trigger=kw.pop("trigger", None),
        sampler=kw.pop("sampler", None),
        reset=kw.pop("reset", None),
        weights=weights,
    )


def _done(kw: dict, fn: str) -> None:
    kw.pop("recalc", None)  # no incremental drift to flush (module doc)
    if kw:
        raise TypeError(f"stats.{fn}() got unexpected options {sorted(kw)}")


def count(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "count")
    return r.count()


def unique(x: TickStream, interval=None, precision: int = 10, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "unique")
    return r._emit(r.unique_col(precision))


def first(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "first")
    return r.first()


def last(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "last")
    return r.last()


def sum(x: TickStream, interval=None, precise: bool = False,
        weights: TickStream | None = None, **kw) -> TickStream:
    # precise=True selects the reference's Kahan kernel; Spark's sums
    # are already compensated per-partition, so both map to sum_col
    r = _roll(x, interval, kw, weights); _done(kw, "sum")
    return r.wsum() if weights is not None else r.sum()


def mean(x: TickStream, interval=None,
         weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "mean")
    return r.wmean() if weights is not None else r.mean()


def prod(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "prod")
    return r.prod()


def gmean(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "gmean")
    return r.gmean()


def min(x: TickStream, interval=None, **kw) -> TickStream:  # noqa: A001
    r = _roll(x, interval, kw); _done(kw, "min")
    return r.min()


def max(x: TickStream, interval=None, **kw) -> TickStream:  # noqa: A001
    r = _roll(x, interval, kw); _done(kw, "max")
    return r.max()


def min_max(x: TickStream, interval=None, **kw) -> TickStream:
    """Both extremes in one pass — value is a (min, max) struct
    (reference returns the pair from one monotonic-deque kernel)."""
    r = _roll(x, interval, kw); _done(kw, "min_max")
    return r._emit(
        F.struct(r.min_col().alias("min"), r.max_col().alias("max"))
    )


def quantile(x: TickStream, interval=None, quant: float = 0.5,
             interpolation: str = "linear", **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "quantile")
    return r.quantile(quant, interpolation)


def median(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "median")
    return r.median()


def rank(x: TickStream, interval=None, method: str = "min",
         na_option: str = "keep", **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "rank")
    return r.rank(method, na_option)


def argmax(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "argmax")
    return r.argmax()


def argmin(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "argmin")
    return r.argmin()


def var(x: TickStream, interval=None, ddof: int = 1,
        weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "var")
    return r.wvar(ddof) if weights is not None else r.var(ddof)


def stddev(x: TickStream, interval=None, ddof: int = 1,
           weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "stddev")
    return r.wstddev(ddof) if weights is not None else r.stddev(ddof)


def sem(x: TickStream, interval=None, ddof: int = 1,
        weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "sem")
    return r.wsem(ddof) if weights is not None else r.sem(ddof)


def skew(x: TickStream, interval=None, bias: bool = False, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "skew")
    return r.skew(bias)


def kurt(x: TickStream, interval=None, excess: bool = True,
         bias: bool = False, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "kurt")
    return r.kurt(excess, bias)


def cov(x: TickStream, y: TickStream, interval=None,
        min_window=None, ddof: int = 1, min_data_points: int = 0,
        **kw) -> TickStream:
    _done(kw, "cov")
    return RollingPair(
        x, y, interval=interval, min_window=min_window,
        min_data_points=min_data_points,
    ).cov(ddof)


def corr(x: TickStream, y: TickStream, interval=None,
         min_window=None, min_data_points: int = 0, **kw) -> TickStream:
    _done(kw, "corr")
    return RollingPair(
        x, y, interval=interval, min_window=min_window,
        min_data_points=min_data_points,
    ).corr()


def cross_sectional(x: TickStream, interval=None,
                    as_numpy: bool = False, **kw) -> TickStream:
    # as_numpy is representation-only in the reference (list vs array);
    # the value is an ArrayType column either way here
    r = _roll(x, interval, kw); _done(kw, "cross_sectional")
    return r.cross_sectional()


def list_to_numpy(x: TickStream, **_kw: Any) -> TickStream:
    """Reference csp.stats.list_to_numpy (stats.py:196): converts
    ts[List[float]] → ts[np.ndarray]. Both are ArrayType columns in
    the tick table, so this is the identity — kept for source
    compatibility."""
    return x


def numpy_to_list(x: TickStream, **_kw: Any) -> TickStream:
    """Inverse of list_to_numpy — identity here (stats.py:206)."""
    return x


def cov_matrix(x: TickStream, interval=None, ddof: int = 1, **kw):
    """Reference csp.stats.cov_matrix (stats.py:2337): the reference
    consumes one np-array edge and emits a matrix per tick; the
    Spark-first form consumes the LONG-format tick table (series =
    key column) and returns matrix ENTRIES — (key_a, key_b, cov)
    for the full window, or (key_a, key_b, ts, seq, cov) per tick
    when ``interval`` is given (matrix.py; SURVEY §2.5). Pairs
    parallelize over the cluster instead of vectorizing per row."""
    from .matrix import cov_matrix as _full, rolling_cov_matrix as _roll_m

    kw.pop("recalc", None)
    kw.pop("ignore_na", None)  # pair frame drops non-coincident rows
    if kw:
        raise TypeError(
            f"stats.cov_matrix() got unexpected options {sorted(kw)}"
        )
    if interval is None:
        return _full(x, ddof=ddof)
    return _roll_m(x, interval, ddof=ddof)


def corr_matrix(x: TickStream, interval=None, **kw):
    """Reference csp.stats.corr_matrix (stats.py:2694) — see
    cov_matrix for the long-format mapping. Rolling form derives
    each pair correlation from the rolling covariance with ddof=0
    normalization cancelling in the ratio."""
    from pyspark.sql import Window

    from ..core.ticks import SEQ, TS
    from .matrix import _pairs, corr_matrix as _full

    kw.pop("recalc", None)
    kw.pop("ignore_na", None)
    if kw:
        raise TypeError(
            f"stats.corr_matrix() got unexpected options {sorted(kw)}"
        )
    if interval is None:
        return _full(x)
    p = _pairs(x)
    if isinstance(interval, int):
        w = (
            Window.partitionBy("key_a", "key_b")
            .orderBy(TS, SEQ)
            .rowsBetween(-(interval - 1), 0)
        )
    else:
        us = int(interval.total_seconds() * 1_000_000)
        p = p.withColumn("__tsu", F.unix_micros(F.col(TS)))
        w = (
            Window.partitionBy("key_a", "key_b")
            .orderBy("__tsu")
            .rangeBetween(-(us - 1), 0)
        )
    return p.select(
        "key_a", "key_b", TS, SEQ,
        F.corr("va", "vb").over(w).alias("corr"),
    )
