"""csp.impl.types.typing_utils parity (reference
csp/impl/types/typing_utils.py:46-110): the typing-inspection helpers
reference adapter code calls — original implementations over the
stdlib typing module."""

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
