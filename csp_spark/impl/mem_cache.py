"""csp.impl.mem_cache parity (reference csp/impl/mem_cache.py): the
wiring memoization cache controls under their defining-module path."""

from ..core.surface import clear_global_context, new_global_context  # noqa: F401
from ..plans.runtime import memoize  # noqa: F401

csp_memoized = memoize


def csp_memoized_graph_object(*args, **kwargs):
    """Reference mem_cache.py decorator form with force_memoize=."""
    kwargs.pop("force_memoize", None)
    if args and callable(args[0]):
        return memoize(args[0])
    return memoize
