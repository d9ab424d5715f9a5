"""csp.impl.types.tstype parity (csp/impl/types/tstype.py): the ts[]
annotation marker under its defining-module path — the single most
imported csp.impl path in reference adapter/example code."""

from ...core.surface import ts  # noqa: F401


def isTsType(typ) -> bool:
    """Reference tstype.py isTsType: is this annotation a ts[...]?"""
    return typ is ts or getattr(typ, "__origin__", None) is ts or (
        isinstance(typ, type) and issubclass(typ, ts)
    )


#: reference tstype.py:60: ``ts = TsType`` — same object, both names
TsType = ts

from ...core.surface import DynamicBasket  # noqa: E402,F401
from ...plans.runtime import (  # noqa: E402,F401
    _AttachMarker as AttachType,
    _SnapKeyMarker as SnapKeyType,
    _SnapMarker as SnapType,
)


class DynamicBasketMeta(type):
    """reference tstype.py:64-70: ``DynamicBasket[K, V]`` is sugar for
    ``typing.Dict[ts[K], ts[V]]``."""

    def __getitem__(cls, args):
        import typing

        if not isinstance(args, tuple) or len(args) != 2:
            raise ValueError(
                "csp.DynamicBasket[] requires keys_type,value_type args"
            )
        return typing.Dict[ts[args[0]], ts[args[1]]]


def isTsBasket(t) -> bool:
    """reference tstype.py:79: Dict[?, ts] or List[ts]."""
    import typing

    origin = typing.get_origin(t)
    args = typing.get_args(t)
    if origin is dict and len(args) == 2:
        return isTsType(args[1])
    if origin is list and len(args) == 1:
        return isTsType(args[0])
    return False


def isTsDynamicBasket(t) -> bool:
    """reference tstype.py:86: Dict[ts, ts]."""
    import typing

    origin = typing.get_origin(t)
    args = typing.get_args(t)
    return (
        origin is dict and len(args) == 2
        and isTsType(args[0]) and isTsType(args[1])
    )


def isTsStaticBasket(t) -> bool:
    """reference tstype.py:95."""
    return isTsBasket(t) and not isTsDynamicBasket(t)


class _GenericTSTypesMeta(type):
    def __getitem__(cls, typ):
        import typing

        class _NS:
            T_VAR = typing.TypeVar(typ) if isinstance(typ, str) else typ
            TS_TYPE = ts[typ]
            TS_LIST_BASKET_TYPE = typing.List[ts[typ]]
            TS_DICT_BASKET_TYPE = typing.Dict[str, ts[typ]]

        _NS.__name__ = f"GenericTSTypes[{typ}]"
        return _NS


class GenericTSTypes(metaclass=_GenericTSTypesMeta):
    """reference tstype.py:128-136: per-type namespace of the common
    ts/basket annotations (``GenericTSTypes['T'].TS_TYPE`` etc.)."""


# reference tstype.py module-scope TypeVars
from typing import TypeVar as _TypeVar

_TYPE_VAR = _TypeVar("T")
_KEY_VAR = _TypeVar("K")
