"""csp.impl.types.tstype parity (csp/impl/types/tstype.py): the ts[]
annotation marker under its defining-module path — the single most
imported csp.impl path in reference adapter/example code."""

from ...core.surface import ts  # noqa: F401


def isTsType(typ) -> bool:
    """Reference tstype.py isTsType: is this annotation a ts[...]?"""
    return typ is ts or getattr(typ, "__origin__", None) is ts or (
        isinstance(typ, type) and issubclass(typ, ts)
    )
