"""Graph-build-time type diagnostics.

Reference: csp rejects miswired graphs AT WIRING TIME with precise
errors from its type-resolver stack
(csp/impl/types/instantiation_type_resolver.py:100-190 —
TypeMismatchError / ArgTypeMismatchError / TSArgTypeMismatchError;
exercised by tests/test_type_checking.py). On Spark the DataFrame
schema IS the type system, so the wiring check is a schema check:
every combination point (align, merge, binary math, boolean gates)
validates its inputs when the plan is BUILT — a pure driver-side
schema inspection, no job — and raises the csp-style error
immediately, instead of surfacing a distant AnalysisException (or a
wrong-typed column) at action time.

Error classes keep the reference's names and message shape
(``In function f: Expected ts[int] for argument 'x', got ts[str]``)
so csp users see familiar diagnostics.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from .ticks import KEY, SEQ, TS

if TYPE_CHECKING:  # pragma: no cover
    from .ticks import TickStream


class TypeMismatchError(TypeError):
    """Base of all wiring-time type errors (reference
    instantiation_type_resolver.py:100)."""


class ArgTypeMismatchError(TypeMismatchError):
    """A scalar argument has the wrong type (reference :113)."""

    def __init__(self, func_name: str, expected_t: str, actual_arg, arg_name: str):
        self._args = (func_name, expected_t, actual_arg, arg_name)
        super().__init__(
            f"In function {func_name}: Expected {expected_t} for argument "
            f"'{arg_name}', got {actual_arg!r} ({type(actual_arg).__name__})"
        )

    def __reduce__(self):
        return (ArgTypeMismatchError, self._args)


class TSArgTypeMismatchError(TypeMismatchError):
    """A tick-stream argument ticks the wrong value type (reference
    :152). ``expected_t`` / ``actual_t`` are Spark simpleString type
    names (``ts[double]``, ``ts[string]``, ...)."""

    def __init__(self, func_name: str, expected_t: str, actual_t: str | None,
                 arg_name: str):
        self._args = (func_name, expected_t, actual_t, arg_name)
        actual = f"ts[{actual_t}]" if actual_t else "None"
        super().__init__(
            f"In function {func_name}: Expected ts[{expected_t}] for argument "
            f"'{arg_name}', got {actual}"
        )

    def __reduce__(self):
        return (TSArgTypeMismatchError, self._args)


class TickSchemaError(TypeMismatchError):
    """A DataFrame wired as a tick stream is missing the engine
    columns or carries them with non-engine types."""

    def __init__(self, func_name: str, arg_name: str, problem: str):
        self._args = (func_name, arg_name, problem)
        super().__init__(
            f"In function {func_name}: argument '{arg_name}' is not a valid "
            f"tick stream: {problem}"
        )

    def __reduce__(self):
        return (TickSchemaError, self._args)


_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_NUMERIC = _INTEGRAL | {"float", "double"}


def is_numeric(t: str) -> bool:
    return t in _NUMERIC or t.startswith("decimal")


def value_type(x: "TickStream") -> str:
    """The stream's tick value type as a Spark simpleString name —
    schema-only, no job."""
    dt = dict(x.df.dtypes).get(x.value_col)
    if dt is None:
        raise TickSchemaError(
            "value_type", x.value_col, f"no column {x.value_col!r} in schema"
        )
    return dt


def check_tick_stream(x: "TickStream", func_name: str, arg_name: str) -> None:
    """Validate the engine columns (key/ts/seq) exist with engine
    types — the analogue of csp's ts[] argument kind check."""
    dtypes = dict(x.df.dtypes)
    for col, want in ((KEY, ("string",)), (TS, ("timestamp", "timestamp_ntz")),
                      (SEQ, tuple(_INTEGRAL))):
        got = dtypes.get(col)
        if got is None:
            raise TickSchemaError(
                func_name, arg_name, f"missing engine column {col!r}"
            )
        if got not in want:
            raise TickSchemaError(
                func_name, arg_name,
                f"engine column {col!r} must be {' or '.join(want)}, got {got}",
            )
    if x.value_col not in dtypes:
        raise TickSchemaError(
            func_name, arg_name, f"missing value column {x.value_col!r}"
        )


def require_numeric(x: "TickStream", func_name: str, arg_name: str) -> str:
    t = value_type(x)
    if not is_numeric(t):
        raise TSArgTypeMismatchError(func_name, "numeric", t, arg_name)
    return t


def require_boolean(x: "TickStream", func_name: str, arg_name: str) -> None:
    t = value_type(x)
    if t != "boolean":
        raise TSArgTypeMismatchError(func_name, "bool", t, arg_name)


def require_compatible(x: "TickStream", y: "TickStream", func_name: str,
                       arg_name: str = "y") -> None:
    """Both streams must tick one unifiable type: identical types, or
    both numeric (csp's resolver upcasts int→float when unifying
    ts['T'] arguments; anything else is a wiring error)."""
    tx, ty = value_type(x), value_type(y)
    if tx == ty or (is_numeric(tx) and is_numeric(ty)):
        return
    raise TSArgTypeMismatchError(func_name, tx, ty, arg_name)
