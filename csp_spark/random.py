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
    brownian_motion,
    brownian_motion_1d,
    brownian_motion_nd,
    hash_normal,
    hash_uniform,
    poisson_timer,
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
