"""``csp.math`` import-path parity (reference csp/math.py:14-407).

Re-exports the package's element-wise stream math under the
reference's module name, and adds the reference's module-level
surface that is not re-exported at the package top level:
``andnode``/``ornode`` (list-basket conjunction, math.py:75-92),
variadic ``and_``/``or_`` (math.py:80-94), and the
``define_binary_op``/``define_unary_op`` factories (math.py:235-357).

Factory lambdas here operate on Spark ``Column`` expressions (the
JVM-codegen path) rather than per-tick Python scalars — arithmetic,
comparison, and boolean lambdas translate verbatim; value-branching
lambdas (``x if x < y else y``) must be written with ``F.when``.
"""

from .operators.math_ops import (  # noqa: F401
    abs_ as abs,
    add,
    arccos,
    arccosh,
    arcsin,
    arcsinh,
    arctan,
    arctanh,
    bitwise_not,
    cos,
    cosh,
    divide,
    eq,
    erf,
    exp,
    exp2,
    floordiv,
    ge,
    gt,
    le,
    ln,
    log10,
    log2,
    lt,
    max_ as max,
    min_ as min,
    mod,
    multiply,
    ne,
    neg,
    not_,
    pos,
    pow_ as pow,
    sin,
    sinh,
    sqrt,
    sub,
    tan,
    tanh,
)
from .operators.math_ops import _bin, _un
from .operators.math_ops import and_ as _and2
from .operators.math_ops import or_ as _or2

__all__ = [
    "abs", "add", "and_", "arccos", "arccosh", "arcsin", "arcsinh",
    "arctan", "arctanh", "bitwise_not", "cos", "cosh", "divide", "eq",
    "erf", "exp", "exp2", "floordiv", "ge", "gt", "le", "ln", "log10",
    "log2", "lt", "max", "min", "mod", "multiply", "ne", "neg", "not_",
    "or_", "pos", "pow", "sin", "sinh", "sqrt", "sub", "tan", "tanh",
    "andnode", "ornode", "define_binary_op", "define_unary_op",
]


def andnode(x):
    """Reference math.py:75-78: AND over a list basket of bool streams
    (valid semantics — emits once every member is valid)."""
    out = x[0]
    for s in x[1:]:
        out = _and2(out, s)
    return out


def ornode(x):
    """Reference math.py:87-90: OR over a list basket of bool streams."""
    out = x[0]
    for s in x[1:]:
        out = _or2(out, s)
    return out


def and_(*inputs):
    """Reference math.py:80-84: variadic boolean AND."""
    if len(inputs) < 2:
        raise ValueError("and_ requires at least 2 inputs")
    return andnode(list(inputs))


def or_(*inputs):
    """Reference math.py:92-96: variadic boolean OR."""
    if len(inputs) < 2:
        raise ValueError("or_ requires at least 2 inputs")
    return ornode(list(inputs))


def define_binary_op(name, op_lambda):
    """Reference math.py:235-303 factory: a binary stream op with
    valid semantics from a two-argument Column expression."""
    return _bin(op_lambda, name=name)


def define_unary_op(name, op_lambda):
    """Reference math.py:307-357 factory: an element-wise unary op
    from a one-argument Column expression."""
    return _un(op_lambda)


import typing as _typing

U = _typing.TypeVar("U")

#: reference math.py:101-137 — the operator name registries user code
#: introspects (define_binary_op consumers, test generators)
MATH_OPS = [
    "add", "sub", "multiply", "divide", "pow", "max", "min",
    "floordiv", "mod",
    "pos", "neg", "abs", "ln", "log2", "log10", "exp", "exp2",
    "sqrt", "erf", "sin", "cos", "tan", "arcsin", "arccos", "arctan",
    "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh",
]
COMP_OPS = ["eq", "ne", "lt", "gt", "le", "ge"]
#: the reference maps (op, dtype) -> C++ kernels here; this engine has
#: no C++ kernel table — every op IS the Catalyst column expression —
#: so the registry is deliberately empty (parity of shape, not of
#: backing store)
MATH_COMP_OPS_CPP: dict = {}


# reference-parity module-scope TypeVars: ported programs do
# `from csp.math import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
