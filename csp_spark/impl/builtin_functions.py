"""csp.impl.builtin_functions parity (reference
csp/impl/builtin_functions.py): the node-body intrinsics and their
registry under the defining-module path. Each name resolves to the
SAME object as the package-level export — lazily (PEP 562), because
the registry is assembled at the end of the package __init__ and this
module is imported during it."""

_NAMES = frozenset({
    "ALL_CSP_BUILTIN_FUNCS",
    "alarm", "cancel_alarm", "schedule_alarm",
    "engine_end_time", "engine_start_time", "engine_stats",
    "in_realtime", "now",
    "item_at", "items_at", "time_at", "times_at",
    "value_at", "values_at",
    "make_active", "make_passive",
    "output", "state", "alarms", "start", "stop",
    "is_configured_realtime",
    "num_ticks", "ticked", "valid",
    "set_buffering_policy", "remove_dynamic_key",
    "set_capture_cpp_backtrace",
})


def csp_builtin(func):
    """reference builtin_functions.py:13: register a node-body
    intrinsic in the shared registry (user extensions use it too)."""
    import csp_spark

    csp_spark.ALL_CSP_BUILTIN_FUNCS[func.__name__] = func
    return func


def __getattr__(name: str):
    if name == "CSP_BUILTIN_CONTEXT_DICT":
        # reference builtin_functions.py:431: the name->intrinsic dict
        # node parsers resolve against (lazy: the registry is built at
        # the end of the package __init__)
        import csp_spark

        return dict(csp_spark.ALL_CSP_BUILTIN_FUNCS)
    if name in _NAMES:
        import csp_spark

        return getattr(csp_spark, name)
    raise AttributeError(f"module 'csp.impl.builtin_functions' has no attribute {name!r}")


def __dir__():
    return sorted(_NAMES | {"CSP_BUILTIN_CONTEXT_DICT"})


# reference-parity module-scope TypeVars: ported programs do
# `from csp.impl.builtin_functions import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
