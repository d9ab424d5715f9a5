"""csp.math parity — element-wise math over tick streams.

Reference: csp/math.py:14-407 (op table 139-231, binary factory
234-303; C++ kernels cpp/csp/cppnodes/mathimpl.cpp). Binary ops use
*valid* semantics — fire when either input ticks, combine latest
values, emit only once both inputs are valid (math.py:253-255) — which
is exactly our align kernel. All functions are Spark built-ins
(JVM-side, whole-stage codegen); none drop to Python.
"""

from __future__ import annotations

import math as _m
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.align import binary_op
from ..core.ticks import TickStream

# ---------------------------------------------------------------------
# binary ops (csp/math.py:139-231 MATH_OPS / COMPARISON_OPS)
# ---------------------------------------------------------------------

def _bin(fn: Callable[[Column, Column], Column], check: str = "numeric",
         name: str | None = None):
    """check: wiring-time input validation (reference resolver parity,
    core/wiring.py) — 'numeric' (arithmetic), 'compatible'
    (comparisons: same type or both numeric), 'boolean' (logic)."""

    def op(x: TickStream, y: TickStream) -> TickStream:
        from ..core.wiring import (
            require_boolean, require_compatible, require_numeric,
        )

        fname = name or getattr(fn, "__name__", "binary_op")
        if check == "numeric":
            require_numeric(x, fname, "x")
            require_numeric(y, fname, "y")
        elif check == "compatible":
            require_compatible(x, y, fname)
        elif check == "boolean":
            require_boolean(x, fname, "x")
            require_boolean(y, fname, "y")
        return binary_op(x, y, fn)

    return op

add = _bin(lambda a, b: a + b, name="add")
sub = _bin(lambda a, b: a - b, name="sub")
multiply = _bin(lambda a, b: a * b, name="multiply")
divide = _bin(lambda a, b: a.cast("double") / b, name="divide")
pow_ = _bin(lambda a, b: F.pow(a, b), name="pow")
floordiv = _bin(lambda a, b: F.floor(a / b), name="floordiv")
mod = _bin(lambda a, b: a % b, name="mod")
min_ = _bin(lambda a, b: F.least(a, b), name="min")
max_ = _bin(lambda a, b: F.greatest(a, b), name="max")

eq = _bin(lambda a, b: a == b, check="compatible", name="eq")
ne = _bin(lambda a, b: a != b, check="compatible", name="ne")
lt = _bin(lambda a, b: a < b, check="compatible", name="lt")
gt = _bin(lambda a, b: a > b, check="compatible", name="gt")
le = _bin(lambda a, b: a <= b, check="compatible", name="le")
ge = _bin(lambda a, b: a >= b, check="compatible", name="ge")

and_ = _bin(lambda a, b: a & b, check="boolean", name="and")
or_ = _bin(lambda a, b: a | b, check="boolean", name="or")


# ---------------------------------------------------------------------
# unary ops (csp/math.py:306-407)
# ---------------------------------------------------------------------

def _un(fn: Callable[[Column], Column]):
    def op(x: TickStream) -> TickStream:
        return x.with_df(x.df.withColumn(x.value_col, fn(F.col(x.value_col))))
    return op

pos = _un(lambda c: c)
neg = _un(lambda c: -c)
abs_ = _un(F.abs)
ln = _un(lambda c: F.log(c))
log2 = _un(F.log2)
log10 = _un(F.log10)
exp = _un(F.exp)
exp2 = _un(lambda c: F.pow(F.lit(2.0), c))
sqrt = _un(F.sqrt)
sin = _un(F.sin)
cos = _un(F.cos)
tan = _un(F.tan)
arcsin = _un(F.asin)
arccos = _un(F.acos)
arctan = _un(F.atan)
sinh = _un(F.sinh)
cosh = _un(F.cosh)
tanh = _un(F.tanh)
arcsinh = _un(lambda c: F.log(c + F.sqrt(c * c + 1)))
arccosh = _un(lambda c: F.log(c + F.sqrt(c * c - 1)))
arctanh = _un(lambda c: F.lit(0.5) * F.log((1 + c) / (1 - c)))
not_ = _un(lambda c: ~c)
bitwise_not = _un(F.bitwise_not)


def _erf(c: Column) -> Column:
    """erf via commons-math3 (on Spark's classpath) through reflect() —
    exact to machine precision, JVM-side, matching the reference's C++
    std::erf (mathimpl.cpp)."""
    return F.call_function(
        "reflect",
        F.lit("org.apache.commons.math3.special.Erf"),
        F.lit("erf"),
        c.cast("double"),
    ).cast("double")


erf = _un(_erf)
