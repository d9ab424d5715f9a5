"""csp.impl.types.container_type_normalizer parity (reference
csp/impl/types/container_type_normalizer.py): normalize PEP 585
builtin generics onto ``typing`` aliases and map normalized
annotations back to concrete python container types — original
implementations of the three methods reference code calls."""

from __future__ import annotations

import typing

import numpy

from .typing_utils import CspTypingUtils


class ContainerTypeNormalizer:
    _TYPING_TO_BUILTIN = {
        typing.List: list, typing.Set: set,
        typing.Dict: dict, typing.Tuple: tuple,
    }
    _BUILTIN_TO_TYPING = {
        list: typing.List, set: typing.Set,
        dict: typing.Dict, tuple: typing.Tuple,
    }

    @classmethod
    def canonicalize_builtin_generics(cls, typ):
        if CspTypingUtils.is_generic_container(typ):
            origin = cls._BUILTIN_TO_TYPING.get(typ.__origin__)
            args = tuple(
                cls.canonicalize_builtin_generics(a)
                for a in typing.get_args(typ)
            )
            if origin is not None:
                return origin[args if len(args) > 1 else args[0]]
            return typ
        return cls._BUILTIN_TO_TYPING.get(typ, typ)

    @classmethod
    def normalize_type(cls, typ):
        return cls.canonicalize_builtin_generics(typ)

    @classmethod
    def normalized_type_to_actual_python_type(cls, typ, level: int = 0):
        if CspTypingUtils.is_numpy_array_type(typ):
            return numpy.ndarray
        if CspTypingUtils.is_generic_container(typ):
            origin = CspTypingUtils.get_origin(typ)
            return cls._TYPING_TO_BUILTIN.get(origin, origin)
        return cls._TYPING_TO_BUILTIN.get(typ, typ)
