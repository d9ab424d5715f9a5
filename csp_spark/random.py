"""csp.random namespace parity (reference csp/random.py __all__ =
poisson_timer, brownian_motion, brownian_motion_1d).

Naming delta, documented: the reference's ``brownian_motion`` is the
N-dimensional covariance form and ``brownian_motion_1d`` the scalar
convenience; here the scalar form is the primary ``brownian_motion``
(it is the common case on keyed streams — Spark parallelizes over
keys where csp vectorizes over dimensions) and the covariance form is
``brownian_motion_nd``. All draws are hash-based (partition- and
retry-independent) — see sources/random_gen.py.
"""

from .sources.random_gen import (
    brownian_motion as _brownian_scalar,
    brownian_motion_1d,
    brownian_motion_nd,
    hash_normal,
    hash_uniform,
    poisson_timer,
)


def _as_seed(seed) -> int:
    """Reference contract: seed is anything np.random.default_rng
    accepts (or a Generator); the hash-draw kernels need one int."""
    import numpy as _np

    if isinstance(seed, (int, _np.integer)):
        return int(seed)
    rng = seed if isinstance(seed, _np.random.Generator) \
        else _np.random.default_rng(seed)
    return int(rng.integers(1, 2**31 - 1))


def _const_edge_value(edge, what: str):
    """The single constant value of a parameter edge (the reference
    accepts time-VARYING ts drift/covariance; this engine folds the
    Cholesky at plan-build time, so the parameters must be const).

    Structural check, no Spark job: const/curve edges carry their
    driver-born rows on ``TickStream.local_rows`` (set only by
    from_rows); any cluster-backed edge (timer, parquet, a transform)
    has none and is rejected WITHOUT executing its plan — wiring a
    graph must never launch a scan just to raise."""
    from .core.ticks import LOCAL_ROWS_OVER_CAP

    rows = getattr(edge, "local_rows", None)
    if rows == LOCAL_ROWS_OVER_CAP:
        raise NotImplementedError(
            f"the {what} edge is a literal curve with more ticks than "
            "the constant fold reads driver-side (LOCAL_ROWS_CAP) — "
            "pass the single value as csp.const(...)"
        )
    if not rows:
        raise NotImplementedError(
            f"time-varying {what} is not supported here — pass a "
            f"csp.const(...) edge (got a non-constant stream plan)"
        )
    values = [r[3] for r in rows]
    if len({repr(v) for v in values}) != 1:
        raise NotImplementedError(
            f"time-varying {what} is not supported here — pass a "
            f"csp.const(...) edge (got {len(values)} ticks)"
        )
    return values[0]


def brownian_motion(trigger, drift=None, covariance=None, seed=42,
                    return_increments=False, **kwargs):
    """Reference signature (csp/random.py:70-133): N-dimensional
    Brownian motion with ``ts`` drift/covariance edges and an
    np.random seed — dispatched onto the constant-fold
    :func:`brownian_motion_nd` kernel. The Spark-first SCALAR form
    (``brownian_motion(trigger, drift=0.0, vol=1.0, ...)``, the common
    case on keyed streams) is kept for plain-number arguments."""
    from .core.ticks import TickStream

    if covariance is None and not isinstance(drift, TickStream):
        # scalar spark-first form (documented naming delta)
        if return_increments:
            raise NotImplementedError(
                "return_increments is not supported; difference the "
                "path with csp.diff"
            )
        if drift is None:
            return _brownian_scalar(trigger, seed=_as_seed(seed), **kwargs)
        return _brownian_scalar(trigger, drift=drift, seed=_as_seed(seed),
                                **kwargs)
    if return_increments:
        raise NotImplementedError(
            "return_increments is not supported; difference the path "
            "with csp.diff"
        )
    if drift is None or covariance is None:
        raise ValueError(
            "the N-dimensional brownian_motion form needs BOTH drift "
            "and covariance (ts edges or sequences)"
        )
    dv = _const_edge_value(drift, "drift") if isinstance(
        drift, TickStream) else list(drift)
    cv = _const_edge_value(covariance, "covariance") if isinstance(
        covariance, TickStream) else list(covariance)
    return brownian_motion_nd(
        trigger, drift=[float(x) for x in dv],
        covariance=[[float(x) for x in row] for row in cv],
        seed=_as_seed(seed), **kwargs,
    )

__all__ = (
    "poisson_timer",
    "brownian_motion",
    "brownian_motion_1d",
    "brownian_motion_nd",
    "hash_uniform",
    "hash_normal",
)


# reference-parity module-scope TypeVars: ported programs do
# `from csp.random import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
