"""csp.impl.types.autogen_types parity (reference
csp/impl/types/autogen_types.py): the engine enums under their
defining-module path (TimeIndexPolicy at reference line 26;
DuplicatePolicy ships alongside in this engine's history module)."""

from ...operators.history import DuplicatePolicy, TimeIndexPolicy  # noqa: F401
