"""csp.typing parity (reference csp/typing.py:25-60): annotation
markers for numpy-array-valued edges. In the tick-table model an
array-valued edge is an ArrayType column (SURVEY §1.3 — Spark
parallelizes over keys what csp vectorizes over arrays), so these
markers exist to keep reference annotations importable and
subscriptable; they also validate/coerce values the way the
reference's pydantic hooks do when called directly."""

from __future__ import annotations

from typing import Any, Generic, TypeVar

import numpy

T = TypeVar("T")


class NumpyNDArray(Generic[T]):
    """``NumpyNDArray[float]`` annotation marker. Calling it coerces
    to an ndarray of the subscripted dtype (reference validator
    behavior, csp/typing.py:_get_validator_np)."""

    _dtype: Any = None

    def __class_getitem__(cls, item: Any):
        sub = type(
            f"{cls.__name__}[{getattr(item, '__name__', item)}]",
            (cls,),
            {"_dtype": item},
        )
        return sub

    def __new__(cls, value: Any):
        # an unresolved TypeVar dtype (bare Numpy1DArray inherits
        # _dtype = ~T from the NumpyNDArray[T] base subscription)
        # means "no dtype constraint", same as the bare ND form
        dtype = cls._dtype
        if dtype is None or isinstance(dtype, TypeVar):
            dtype = None
        try:
            return (
                numpy.asarray(value, dtype=dtype)
                if dtype is not None
                else numpy.asarray(value)
            )
        except TypeError:
            raise ValueError(f"Unable to convert {value} to an array.")


class Numpy1DArray(NumpyNDArray[T], Generic[T]):
    """``Numpy1DArray[float]`` — the single-dimension form
    (csp/typing.py). Coercion additionally checks rank."""

    def __new__(cls, value: Any):
        arr = super().__new__(cls, value)
        if arr.ndim != 1:
            raise ValueError("value must be a 1-dimensional array")
        return arr
