"""csp.impl.enum parity (reference csp/impl/enum.py): Enum,
EnumMeta (reference enum.py:10 — DynamicEnum and user metaprograms
build enums through it) and DynamicEnum under their defining-module
path."""

from ..core.enum import DynamicEnum, Enum, EnumMeta  # noqa: F401
