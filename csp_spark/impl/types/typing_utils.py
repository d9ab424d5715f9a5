"""csp.impl.types.typing_utils parity (reference
csp/impl/types/typing_utils.py): the typing-inspection helpers
reference adapter code calls — original implementations over the
stdlib typing module. ``FastList`` (reference typing_utils.py:14 —
reference struct.py:11 imports it from exactly this path) is the
list-field annotation marker whose native fast-list storage Spark's
ArrayType replaces outright; ``TsTypeValidator`` (reference
typing_utils.py:125) validates a proposed tick element type against a
``ts[...]`` source annotation (``ts[List]`` admits ``ts[List[float]]``;
``ts[Dict[str, List[str]]]`` rejects ``ts[Dict[str, List[float]]]``).
"""

from __future__ import annotations

import collections.abc
import types
import typing

import numpy

from ... import typing as csp_typing


class CspTypingUtils:
    _ORIGIN_COMPAT_MAP = {
        list: typing.List, set: typing.Set,
        dict: typing.Dict, tuple: typing.Tuple,
    }

    @classmethod
    def is_generic_container(cls, typ) -> bool:
        return isinstance(
            typ, (typing._GenericAlias, types.GenericAlias)
        ) and typ.__origin__ not in (typing.Union, typing.Literal)

    @classmethod
    def is_type_spec(cls, val) -> bool:
        return isinstance(val, type) or cls.is_generic_container(val)

    @classmethod
    def get_origin(cls, typ):
        raw = typ.__origin__
        return cls._ORIGIN_COMPAT_MAP.get(raw, raw)

    @classmethod
    def get_orig_base(cls, typ):
        res = typ.__origin__
        if isinstance(res, type) and getattr(res, "__orig_bases__", None):
            return res.__orig_bases__[0]
        return res

    @classmethod
    def is_callable(cls, typ) -> bool:
        if typ is typing.Callable:
            return True
        if not hasattr(typ, "__origin__"):
            return False
        return cls.get_origin(typ) is collections.abc.Callable

    @classmethod
    def is_numpy_array_type(cls, typ) -> bool:
        if not cls.is_generic_container(typ):
            return False
        origin = typ.__origin__
        return origin in (
            csp_typing.Numpy1DArray, csp_typing.NumpyNDArray
        ) or cls.get_orig_base(typ) is numpy.ndarray

    @classmethod
    def is_numpy_nd_array_type(cls, typ) -> bool:
        return (
            cls.is_numpy_array_type(typ)
            and typ.__origin__ is csp_typing.NumpyNDArray
        )

    @classmethod
    def is_union_type(cls, typ) -> bool:
        return (
            isinstance(typ, typing._GenericAlias)
            and typ.__origin__ is typing.Union
        ) or isinstance(typ, types.UnionType)

    @classmethod
    def is_optional_type(cls, typ) -> bool:
        return cls.is_union_type(typ) and type(None) in typing.get_args(typ)

    @classmethod
    def is_literal_type(cls, typ) -> bool:
        return (
            isinstance(typ, typing._GenericAlias)
            and typ.__origin__ is typing.Literal
        )

    @classmethod
    def is_forward_ref(cls, typ) -> bool:
        return isinstance(typ, typing.ForwardRef)


CspTypingUtils310 = CspTypingUtils


_T = typing.TypeVar("_T")


class FastList(typing.List[_T]):
    """Annotation marker for struct list fields (reference
    typing_utils.py:14): ``FastList[int]`` declares a list field whose
    reference backing store is the C++ fast list — here it is simply
    an ArrayType column, so the marker only needs to subscript and to
    refuse bare instantiation (it is a type-level marker, not a
    container)."""

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "FastList is an annotation marker and cannot be instantiated"
        )


class TsTypeValidator:
    """Validate a proposed tick element type against the argument of a
    ``ts[...]`` annotation (reference typing_utils.py:125-235).

    Rules (the reference's documented contract):
    - ``Any``, ``TypeVar`` and forward references accept anything
      (TVar resolution happens at wiring time, core/wiring.py);
    - a plain-type source accepts the same type or a subclass, and
      accepts ``int`` where ``float`` is declared (numeric promotion);
    - a generic-container source requires the same origin; a BARE
      container (``ts[List]``) accepts any argument types, a
      parameterized one validates arguments pairwise and recursively;
    - a union source accepts a value that any arm accepts;
    - a nested ``ts`` argument is rejected at construction.

    Failures raise ``TypeError``. Instances are cached per source type
    via :meth:`make_cached` — basket validation calls this in a loop
    (the reference notes it as the basket-wiring bottleneck; the cache
    plus the plain-type fast path keep it O(1) per element here too).
    """

    _cache: typing.Dict[typing.Any, "TsTypeValidator"] = {}

    @classmethod
    def make_cached(cls, source_type) -> "TsTypeValidator":
        v = cls._cache.get(source_type)
        if v is None:
            v = cls._cache[source_type] = cls(source_type)
        return v

    def __init__(self, source_type):
        from ...core.surface import ts

        if isinstance(source_type, type) and issubclass(source_type, ts):
            raise TypeError(
                f"Found nested ts type - this is not allowed "
                f"(inner type: {source_type})"
            )
        self._source_type = source_type
        self._source_origin = typing.get_origin(source_type)
        self._source_args = typing.get_args(source_type)
        self._source_is_union = CspTypingUtils.is_union_type(source_type)
        self._is_wildcard = (
            source_type is typing.Any
            or isinstance(source_type, (typing.TypeVar, typing.ForwardRef))
            or isinstance(source_type, str)
        )
        if not (
            self._is_wildcard
            or self._source_is_union
            or self._source_origin is not None
            or isinstance(source_type, type)
        ):
            raise TypeError(
                f"Argument to ts must either be: a type, ForwardRef or "
                f"TypeVar. Got {source_type} which is an instance of "
                f"{type(source_type)}."
            )
        self._arg_validators = (
            [TsTypeValidator.make_cached(a) for a in self._source_args]
            if (self._source_origin is not None or self._source_is_union)
            and not self._is_wildcard
            else []
        )

    def validate(self, value_type, info=None):
        if self._is_wildcard or value_type is typing.Any:
            return value_type
        if self._source_is_union:
            for v in self._arg_validators:
                try:
                    return v.validate(value_type, info)
                except TypeError:
                    pass
            raise TypeError(
                f"{value_type} does not validate against union "
                f"{self._source_type}"
            )
        if self._source_origin is None:
            # plain-type source: subclass ok; int promotes to float
            if self._source_type is float and value_type is int:
                return self._source_type
            if isinstance(value_type, type) and isinstance(
                self._source_type, type
            ) and issubclass(value_type, self._source_type):
                return value_type
            raise TypeError(
                f"{value_type} is not a subtype of {self._source_type}"
            )
        # generic-container source
        v_origin = typing.get_origin(value_type)
        if v_origin is None and isinstance(value_type, type):
            v_origin = value_type  # bare `list` offered for ts[List[x]]
        s_o = CspTypingUtils.get_origin(self._source_type)
        v_o = (
            CspTypingUtils.get_origin(value_type)
            if CspTypingUtils.is_generic_container(value_type)
            else v_origin
        )
        if s_o is not v_o and not (
            isinstance(s_o, type)
            and isinstance(v_o, type)
            and issubclass(v_o, s_o)
        ):
            raise TypeError(
                f"container origin mismatch: expected {s_o}, got "
                f"{value_type}"
            )
        if not self._source_args:
            return value_type  # bare ts[List] admits any element type
        v_args = typing.get_args(value_type)
        if not v_args:
            raise TypeError(
                f"{value_type} is unparameterized but {self._source_type} "
                f"requires argument types"
            )
        if len(v_args) != len(self._source_args):
            raise TypeError(
                f"container arity mismatch: {self._source_type} vs "
                f"{value_type}"
            )
        for v, a in zip(self._arg_validators, v_args):
            v.validate(a, info)
        return value_type


# reference-parity module-scope TypeVars: ported programs do
# `from csp.impl.types.typing_utils import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
