"""csp.impl.types.common_definitions parity (reference
csp/impl/types/common_definitions.py): PushMode/ReplayMode, the
Outputs/OutputBasket markers, and the output-declaration error types
under their defining-module path."""

from ...core.surface import (  # noqa: F401
    OutputBasket,
    Outputs,
    OutputTypeError,
    PushMode,
    ReplayMode,
)


# ---------------------------------------------------------------------
# r10 parity closures (reference common_definitions.py:11-270): the
# wiring-facing definition records and enums user adapter code touches
# ---------------------------------------------------------------------
from collections import namedtuple as _namedtuple
from enum import Enum as _Enum, IntEnum as _IntEnum, auto as _auto

from ...core.surface import OutputTypeError  # noqa: E402,F401


class OutputMixedNamedAndUnnamedError(OutputTypeError):
    def __init__(self):
        super().__init__("returning both named and unnamed outputs")


class OutputBasketNotABasket(OutputTypeError):
    def __init__(self, typ=None):
        super().__init__(f"output basket type is not a basket: {typ}")


class OutputBasketMixedShapeAndShapeOf(OutputTypeError):
    def __init__(self):
        super().__init__("cannot mix shape and shape_of on one output")


class OutputBasketWrongShapeType(OutputTypeError):
    def __init__(self, expected=None, got=None):
        super().__init__(f"wrong basket shape type: expected {expected}, got {got}")


class OutputBasketContainer:
    """reference common_definitions.py:145: carries an output-basket
    declaration (type + shape/shape_of) through wiring. Shape here is
    declarative only — the long tick format sizes baskets by data."""

    SHAPE_FUNCS = None  # populated lazily below for reference parity

    def __init__(self, typ, shape=None, shape_of=None, eval_type=None):
        if shape is not None and shape_of is not None:
            raise OutputBasketMixedShapeAndShapeOf()
        self.typ = typ
        self.shape = shape
        self.shape_of = shape_of
        self.eval_type = eval_type


InputDef = _namedtuple(
    "InputDef", ["name", "typ", "kind", "basket_kind", "ts_idx", "arg_idx"]
)
OutputDef = _namedtuple(
    "OutputDef", ["name", "typ", "kind", "ts_idx", "shape"]
)


class ArgKind(_IntEnum):
    """reference common_definitions.py:238-265."""

    SCALAR = 0x1
    TS = 0x2
    BASKET_TS = TS | 0x4
    DYNAMIC_BASKET_TS = BASKET_TS | 0x8
    ALARM = TS | 0x10

    def is_any_ts(self):
        return bool(self & ArgKind.TS)

    def is_single_ts(self):
        return self == ArgKind.TS

    def is_scalar(self):
        return self == ArgKind.SCALAR

    def is_basket(self):
        return (self & ArgKind.BASKET_TS) == ArgKind.BASKET_TS

    def is_non_dynamic_basket(self):
        return self == ArgKind.BASKET_TS

    def is_dynamic_basket(self):
        return self == ArgKind.DYNAMIC_BASKET_TS

    def is_alarm(self):
        return self == ArgKind.ALARM


class BasketKind(_Enum):
    LIST = _auto()
    DICT = _auto()
    DYNAMIC_DICT = _auto()


from ...operators.history import DuplicatePolicy  # noqa: E402,F401
