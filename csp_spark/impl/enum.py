"""csp.impl.enum parity (reference csp/impl/enum.py): Enum and
DynamicEnum under their defining-module path."""

from ..core.enum import DynamicEnum, Enum  # noqa: F401
