"""csp.impl.wiring.context parity (csp/impl/wiring/context.py): the
wiring-cache context. In this engine the "context" is the memoized
wiring cache — ``new_global_context`` is the context-manager class
itself (entering clears the caches), so it doubles as ``Context``."""

from ...core.surface import clear_global_context, new_global_context  # noqa: F401

Context = new_global_context
