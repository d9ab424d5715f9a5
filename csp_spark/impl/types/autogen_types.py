"""csp.impl.types.autogen_types parity (reference
csp/impl/types/autogen_types.py): the engine enums under their
defining-module path (TimeIndexPolicy at reference line 26;
DuplicatePolicy ships alongside in this engine's history module)."""

from ...operators.history import DuplicatePolicy, TimeIndexPolicy  # noqa: F401


from ...core.record import Struct as _Struct

#: reference autogen_types.py hints table (C++ autogen metadata; no
#: C++ here, so the table is empty by construction)
CSP_AUTOGEN_HINTS: dict = {}


class DynamicBasketEvent(_Struct):
    """reference autogen_types.py — one dynamic-basket membership
    event (key added/removed)."""

    key: object
    added: bool


class DynamicBasketEvents(_Struct):
    """reference autogen_types.py — the per-cycle batch of
    dynamic-basket membership events."""

    events: list
