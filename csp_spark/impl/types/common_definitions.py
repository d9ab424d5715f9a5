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
