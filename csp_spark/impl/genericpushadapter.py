"""csp.impl.genericpushadapter parity (reference
csp/impl/genericpushadapter.py): GenericPushAdapter under its
defining-module path."""

from .pushadapter import GenericPushAdapter  # noqa: F401
